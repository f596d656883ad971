"""Deduplication operators for the documents table (training-data pipeline).

- exact_dedup: hash-groupBy keeper selection (one shuffle on the hash).
- minhash_lsh: shingle -> per-band minhash -> bucket join candidates ->
  optional exact n-gram Jaccard verification. All hashing is md5-string
  based so results are engine-portable (same trick as queries.py oracles).
- simhash64: 60-bit SimHash from md5 bits of tokens, JVM-side bit ops;
  near-dup = hamming distance <= threshold within LSH blocks
  (max_hamming+1 blocks: pigeonhole guarantees two signatures within the
  threshold share at least one exact block, for ANY threshold).
- ngram_jaccard: exact Jaccard over distinct 3-token shingles for candidate
  pairs (explode + join + distinct counting; no UDF).

Scale: every operator is shuffle-bounded by (band/bucket, signature) keys —
no O(N^2) stage; candidate verification touches only bucket collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, n_docs, keep_id): keeper = min id per exact-text group."""
    return docs.groupBy(F.md5(text_col).alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id")
    )


def shingles_col(text_col: str, n: int = 3):
    """n-token shingles; empty array for docs shorter than n tokens.
    (sequence(1, 0) in Spark is the DESCENDING [1, 0] and slice(toks, 0, n)
    throws INVALID_PARAMETER_VALUE.START — guard with when().)"""
    toks = F.split(F.col(text_col), " ")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    docs: DataFrame, n_bands: int = 8, shingle_n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, band, minhash): band minhash = min md5('band:shingle')."""
    d = docs.where(F.size(F.split(F.col(text_col), " ")) >= shingle_n).select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(text_col, shingle_n)).alias("shingle"),
    )
    bands = d.sparkSession.range(n_bands).select(F.col("id").cast("int").alias("band"))
    d = d.crossJoin(F.broadcast(bands))
    return d.groupBy("doc_id", "band").agg(
        F.min(F.md5(F.concat_ws(":", F.col("band"), F.col("shingle")))).alias("minhash")
    )


def lsh_candidate_pairs(sig: DataFrame, min_bands: int = 2) -> DataFrame:
    """Pairs agreeing on >= min_bands band-minhashes."""
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, ["band", "minhash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .where(F.col("n_bands") >= min_bands)
    )


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, shingle_n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard over distinct shingle sets for given (doc_a, doc_b)
    pairs: |A∩B| via shingle equi-join, |A∪B| = |A|+|B|-|A∩B|."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles_col(text_col, shingle_n))).alias("s"),
    )
    # sizes straight from the array (no explode) so short docs keep n_sh=0
    # instead of silently vanishing from the inner join below
    sizes = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.array_distinct(shingles_col(text_col, shingle_n))).cast("long").alias("n_sh"),
    )
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("s", "s_b")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .where(F.col("s") == F.col("s_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .fillna({"n_inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return out.select(
        "doc_a", "doc_b", "n_inter", "n_a", "n_b",
        # both-empty shingle sets -> NULL (0/0 is an ANSI-mode error)
        F.when(union > 0, F.round(F.col("n_inter") / union, 6)).alias("jaccard"),
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash: per token, 64 bits from md5 hex; signature bit j set
    iff sum over tokens of (+-1 per bit) > 0. Pure JVM expressions:
    conv(substr(md5,...)) + bit ops, aggregated per document."""
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")  # 60 bits
    d = d.select("doc_id", h.alias("h"))
    # per bit position: contribution +1 if bit set else -1
    contribs = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
        ).alias(f"b{b}")
        for b in range(60)
    ]
    agg = d.groupBy("doc_id").agg(*contribs)
    sig = None
    for b in range(60):
        bit = (F.col(f"b{b}") > 0).cast("long") * F.lit(2**b).cast("long")
        sig = bit if sig is None else sig + bit
    return agg.select("doc_id", sig.alias("simhash"))


def simhash_blocks(n_bits: int = 60, max_hamming: int = 3) -> list[tuple[int, int]]:
    """(offset, width) block plan: max_hamming+1 blocks over n_bits, widths
    as even as possible. Pigeonhole: two signatures with hamming <= max_hamming
    differ in at most max_hamming blocks, so they share >= 1 exact block."""
    n_blocks = max_hamming + 1
    base, extra = divmod(n_bits, n_blocks)
    plan, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        plan.append((off, w))
        off += w
    return plan


def simhash_near_dups(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block the 60-bit signature into
    max_hamming+1 keys (pigeonhole guarantees a shared exact block at
    hamming <= max_hamming — r1 used a fixed 4 blocks, silently losing
    recall for thresholds > 3), bucket-join, verify exact hamming JVM-side."""
    blocks = []
    for blk, (off, width) in enumerate(simhash_blocks(60, max_hamming)):
        key = F.shiftright(F.col("simhash"), off).bitwiseAND(F.lit((1 << width) - 1))
        blocks.append(sim.select("doc_id", "simhash", F.lit(blk).alias("blk"), key.alias("key")))
    sigb = blocks[0]
    for x in blocks[1:]:
        sigb = sigb.unionByName(x)
    a, b = sigb.alias("a"), sigb.alias("b")
    cand = (
        a.join(b, ["blk", "key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"), F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
