"""End-to-end training-corpus curation pipeline (VERDICT r4 next-step #6).

Composes the engine's curation pieces into ONE checkpointed, wave-resumable
plans/ pass: dedup keep-one (exact md5 / LSH / winnow near-dup) ->
PII redaction -> quality + language gate -> corpus parquet write. This is
the composition the CLI's separate dedup/analyze subcommands only hint at:
one run id, one lineage table, one output directory a training job reads.

Stage layout (two checkpointed 'tiers' in one CheckpointLog, mirroring the
retention pipeline's rollup/filled stages):

  keep   : the keep-list (doc_id of every kept document). Near-dup
           components are a GLOBAL computation (edges cross any doc pair),
           so this stage runs as one logical wave; its internal joins are
           the bucketed, capped shapes of operators/dedup.py (band/
           fingerprint buckets + max_bucket stop keys — never all-pairs).
  corpus : the doc-local expensive stage — regex PII redaction + quality
           scoring + language ID over every kept text — waved by
           pmod(xxhash64(doc_id), n_waves) with per-wave lineage rows, so
           a resume after executor loss redoes only the missing waves.
           Wave-decomposable because once the keep list exists on disk,
           every operation here is per-document (one doc_id-keyed
           left-semi join + pure projections).

Scale: stage 'keep' shuffles on content hash / bucketed fingerprints only;
stage 'corpus' is projection-dominated (regexp_replace cascade, JVM-side,
whole-stage codegen) and embarrassingly parallel — exactly the stage where
wave-granular resume pays off at 100 TB, because redaction over the full
corpus is the longest stage and losing it to one executor failure would
otherwise mean a full redo.

Reference precedent for the resumable-pass shape: interp/steps.py:879-969
(lock-serialized incremental writes let a crashed run keep finished
chunks); the selection/gating semantics are the engine's own
corpus_select / pii_redact / lang_id contract queries (queries.py).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Window as W, functions as F

from spinterps_spark.plans.checkpoint import (
    CheckpointLog, new_run_id, run_waved_pass,
)

DEDUP_MODES = ("exact", "lsh", "winnow")


def keep_list(
    docs: DataFrame,
    dedup_mode: str = "exact",
    jaccard: float = 0.8,
    max_bucket: int | None = None,
    algorithm: str = "minlabel",
) -> DataFrame:
    """(doc_id) of every KEPT document — one row per keeper.

    exact: keeper = the md5(text) group's minimum doc_id (window-min, one
    shuffle on the content hash). lsh / winnow: candidate pairs (bucketed,
    max_bucket-capped) -> exact n-gram Jaccard verify >= `jaccard` ->
    connected components -> keeper = component minimum; docs with no
    near-dup edge keep themselves."""
    from spinterps_spark.operators import dedup as D

    if dedup_mode == "exact":
        w = W.partitionBy(F.md5("text"))
        return (
            docs.select("doc_id", F.min("doc_id").over(w).alias("_canon"))
            .where(F.col("doc_id") == F.col("_canon"))
            .select("doc_id")
        )
    if dedup_mode == "lsh":
        sig = D.minhash_signatures(docs)
        pairs = D.lsh_candidate_pairs(sig, max_bucket=max_bucket)
        ver = D.ngram_jaccard(docs, pairs.select("doc_a", "doc_b"))
    elif dedup_mode == "winnow":
        ver = D.winnow_candidates(docs, max_bucket=max_bucket)
    else:
        raise ValueError(f"dedup_mode must be one of {DEDUP_MODES}, got {dedup_mode!r}")
    dup = ver.where(F.col("jaccard") >= jaccard).select("doc_a", "doc_b")
    comp = D.connected_components(dup, algorithm=algorithm)
    keep = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("_canon")
    )
    return keep.where(F.col("doc_id") == F.col("_canon")).select("doc_id")


def curation_cols():
    """The gate/annotation projection shared by the pipeline and its
    contract query: (n_tokens, quality_score, lang, n_<pii>..., plus the
    redaction cascade). Quality is the engine's canonical length-scaled
    stopword formula (q_text_quality / q_corpus_select), divisor-guarded
    for ANSI mode like functions/langid.py."""
    from spinterps_spark.functions.langid import lang_pred_col
    from spinterps_spark.functions.redact import pii_count_cols, redact_col
    from spinterps_spark.queries import STOPWORDS

    toks = F.split("text", " ")
    n_tok = F.size(toks)
    sw = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    quality = F.round(
        F.least(F.lit(1.0), n_tok / F.lit(100.0))
        * (1 - F.when(n_tok > 0, sw / n_tok.cast("double")).otherwise(F.lit(0.0))),
        6,
    )
    counts = pii_count_cols(F.col("text"))
    return [
        n_tok.cast("long").alias("n_tokens"),
        quality.alias("quality_score"),
        lang_pred_col(F.col("text"), toks).alias("lang"),
        *[counts[k].alias(f"n_{k}") for k in counts],
        redact_col(F.col("text")).alias("text_redacted"),
    ]


def run_corpus_pipeline(
    spark,
    docs: DataFrame,
    out_dir: str,
    *,
    dedup_mode: str = "exact",
    min_tokens: int = 10,
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    n_waves: int = 4,
    run_id: str | None = None,
    jaccard: float = 0.8,
    max_bucket: int | None = None,
    algorithm: str = "minlabel",
) -> dict:
    """Run (or resume) the curation pipeline over `docs` (doc_id, text).

    Writes out_dir/keep/wave=0 (the keep list), out_dir/corpus/wave=K (the
    selected, annotated, REDACTED corpus) and out_dir/ckpt (lineage).
    Pass the returned run_id back as `run_id` to resume: done waves are
    skipped, only missing ones recompute. Returns summary metrics."""
    if dedup_mode not in DEDUP_MODES:
        raise ValueError(f"dedup_mode must be one of {DEDUP_MODES}, got {dedup_mode!r}")
    t0 = time.time()
    ckpt = CheckpointLog(spark, os.path.join(out_dir, "ckpt"))
    rid = run_id or new_run_id()

    keep = run_waved_pass(
        spark,
        docs,
        lambda d: keep_list(d, dedup_mode, jaccard, max_bucket, algorithm),
        os.path.join(out_dir, "keep"),
        ckpt,
        rid,
        tier="keep",
        n_waves=1,
        wave_key="doc_id",
    )

    def corpus_transform(d: DataFrame) -> DataFrame:
        out = d.join(keep, "doc_id", "left_semi").select(
            "doc_id", *curation_cols()
        )
        out = out.where(
            (F.col("quality_score") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
        )
        if langs:
            out = out.where(F.col("lang").isin(*langs))
        return out

    corpus = run_waved_pass(
        spark,
        docs,
        corpus_transform,
        os.path.join(out_dir, "corpus"),
        ckpt,
        rid,
        tier="corpus",
        n_waves=n_waves,
        wave_key="doc_id",
    )
    # counts come from the WRITTEN parquet (metadata-cheap), not the logical
    # plans — re-counting those would re-run keep/curation a second time
    n_kept = keep.count()
    n_corpus = corpus.count()
    return {
        "run_id": rid,
        "out": out_dir,
        "dedup_mode": dedup_mode,
        "docs_kept": n_kept,
        "corpus_rows": n_corpus,
        "n_waves": n_waves,
        "wall_sec": round(time.time() - t0, 3),
    }
