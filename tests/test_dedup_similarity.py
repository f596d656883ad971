import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spinterps_spark.operators import dedup as D
from spinterps_spark.operators import multimodal as M
from spinterps_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup(spark, docs):
    out = D.exact_dedup(docs).toPandas()
    assert out["n_docs"].sum() == docs.count()
    assert (out["keep_id"] >= 0).all()


def test_minhash_identical_docs_collide(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon zeta",
                "one two three four five six seven",
            ],
        }
    )
    d = spark.createDataFrame(pdf)
    sig = D.minhash_signatures(d, n_bands=4)
    pairs = D.lsh_candidate_pairs(sig, min_bands=2).toPandas()
    assert ((pairs["doc_a"] == 1) & (pairs["doc_b"] == 2)).any()
    assert not ((pairs["doc_b"] == 3) | (pairs["doc_a"] == 3)).any()


def test_ngram_jaccard_exact_values(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c d e", "a b c d x"],
        }
    )
    # shingles(1): {abc,bcd,cde}; shingles(2): {abc,bcd,cdx}; inter=2 union=4
    d = spark.createDataFrame(pdf)
    pairs = spark.createDataFrame([(1, 2, 2)], "doc_a long, doc_b long, n_bands int")
    out = D.ngram_jaccard(d, pairs).toPandas()
    assert out["n_inter"].iloc[0] == 2
    assert out["jaccard"].iloc[0] == 0.5


def test_simhash_properties(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12",
                "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w13",  # 1 token differs
                "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12",  # disjoint
            ],
        }
    )
    d = spark.createDataFrame(pdf)
    sig = D.simhash64(d).toPandas().set_index("doc_id")["simhash"]
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(sig[1], sig[2]) < ham(sig[1], sig[3])
    # identical docs -> identical simhash
    sig2 = D.simhash64(d).toPandas().set_index("doc_id")["simhash"]
    assert (sig == sig2).all()


def test_simhash_near_dups_blocking(spark, docs):
    sig = D.simhash64(docs.limit(200))
    dups = D.simhash_near_dups(sig, max_hamming=3).toPandas()
    # verify every reported pair truly has hamming <= 3
    if len(dups):
        assert (dups["hamming"] <= 3).all()


def test_simhash_blocks_pigeonhole_recall(spark):
    """VERDICT r1 'What's wrong #2': with a fixed 4-block LSH, a hamming-5
    pair whose differing bits hit all 4 old 15-bit blocks was silently
    missed at max_hamming >= 4. Blocks now scale as max_hamming+1."""
    # differing bits at 0, 15, 30, 45, 59: one in each old block
    # [0-14][15-29][30-44][45-59] -> zero shared blocks under the r1 scheme.
    sb = (1 << 0) | (1 << 15) | (1 << 30) | (1 << 45) | (1 << 59)
    sig = spark.createDataFrame(
        [(1, 0), (2, sb)], "doc_id long, simhash long"
    )
    out = D.simhash_near_dups(sig, max_hamming=6).toPandas()
    assert len(out) == 1
    assert out["hamming"].iloc[0] == 5

    # block plan invariants: covers all 60 bits, n_blocks = max_hamming+1
    for mh in (1, 3, 6, 11):
        plan = D.simhash_blocks(60, mh)
        assert len(plan) == mh + 1
        assert sum(w for _o, w in plan) == 60
        offs = [o for o, _w in plan]
        assert offs == sorted(offs) and offs[0] == 0


def test_shingles_short_doc_no_crash(spark):
    """ADVICE r1: sequence(1,0) descending + slice(toks,0,n) crashed on docs
    shorter than the shingle size; now they get empty shingle sets."""
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["one two", "a", "w x y z"]})
    d = spark.createDataFrame(pdf)
    pairs = spark.createDataFrame([(1, 3), (1, 2)], "doc_a long, doc_b long")
    out = D.ngram_jaccard(d, pairs).toPandas().set_index("doc_b")
    assert out.loc[3, "n_a"] == 0 and out.loc[3, "n_b"] == 2
    assert out.loc[3, "n_inter"] == 0


def test_ngram_oracle_parity_with_short_docs(spark):
    """Review r2: the DuckDB twin of ngram_jaccard must keep pairs touching
    sub-shingle-size docs (n_sh = 0) and NULL the both-empty jaccard —
    exactly like the operator. Exercised on a custom documents table since
    the driver fixture has no short docs."""
    import duckdb

    import spinterps_spark.queries as Q

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c d e", "b c d e f", "xy", "zz"],
        }
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(Q.SQL_NGRAM_JACCARD).df()
        .sort_values("doc_a").reset_index(drop=True)
    )
    docs = spark.createDataFrame(pdf)
    ids = docs.select(F.col("doc_id").alias("doc_a"))
    pairs = ids.select("doc_a", (F.col("doc_a") + 1).alias("doc_b")).join(
        docs.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi"
    )
    got = (
        D.ngram_jaccard(docs, pairs).toPandas()
        .sort_values("doc_a").reset_index(drop=True)
    )
    assert len(got) == len(want) == 3  # pairs (1,2), (2,3), (3,4) all kept
    assert (got["n_a"].to_numpy() == want["n_a"].to_numpy()).all()
    assert (got["n_inter"].to_numpy() == want["n_inter"].to_numpy()).all()
    ga, wa = got["jaccard"].to_numpy(float), want["jaccard"].to_numpy(float)
    assert ((ga == wa) | (np.isnan(ga) & np.isnan(wa))).all()
    # the both-empty pair (3,4) is NULL on both sides
    assert np.isnan(got.set_index("doc_a").loc[3, "jaccard"])


def test_cosine_topk_lsh_recall_vs_bruteforce(spark, emb):
    q = emb.where(F.col("vec_id") < 8).withColumnRenamed("vec_id", "q_id")
    exact = SIM.cosine_topk_bruteforce(emb, q, k=5).toPandas()
    # random 64-d embeddings are near-orthogonal (true-neighbor cosine is
    # low), so short signatures + many tables are needed for recall; at
    # production similarity levels (near-dups ~0.9) longer signatures win.
    approx = SIM.cosine_topk_lsh(
        emb, q, k=5, n_tables=24, n_bits=4, dim=64
    ).toPandas()
    e = set(map(tuple, exact[["q_id", "n_id"]].to_numpy()))
    a = set(map(tuple, approx[["q_id", "n_id"]].to_numpy()))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    # sims agree exactly where pairs overlap (same JVM fold both paths)
    m = exact.merge(approx, on=["q_id", "n_id"], suffixes=("_e", "_a"))
    assert np.allclose(m["sim_e"], m["sim_a"], rtol=0, atol=0)


def test_cosine_topk_ivf_recall_and_partition(spark, emb):
    """IVF inverted lists: every vector lands in exactly one list, probing
    n_probe of n_lists bounds the scanned fraction, and recall vs brute
    force tracks the probed share of the database."""
    q = emb.where(F.col("vec_id") < 8).withColumnRenamed("vec_id", "q_id")
    inv = SIM.ivf_centroids(emb, n_lists=8)
    assert inv.count() == 8

    exact = SIM.cosine_topk_bruteforce(emb, q, k=5).toPandas()
    approx = SIM.cosine_topk_ivf(emb, q, k=5, n_lists=8, n_probe=6).toPandas()
    # per query at most k results, ranked contiguously from 1
    per_q = approx.groupby("q_id")["rn"]
    assert (per_q.max() <= 5).all() and (per_q.min() == 1).all()

    e = set(map(tuple, exact[["q_id", "n_id"]].to_numpy()))
    a = set(map(tuple, approx[["q_id", "n_id"]].to_numpy()))
    recall = len(e & a) / len(e)
    # random near-orthogonal embeddings + untrained centroids: probing 6/8
    # of the lists must recover well over half the true neighbors
    assert recall >= 0.5, recall
    # sims agree to the contract rounding where pairs overlap
    m = exact.merge(approx, on=["q_id", "n_id"], suffixes=("_e", "_a"))
    assert np.allclose(np.round(m["sim_e"], 4), m["sim_a"], rtol=0, atol=0)


def test_srp_signatures_single_scan_and_numpy_equal(spark, emb):
    """VERDICT r1 perf-weak: srp_signatures scanned the vector table
    n_tables times via union. Now: ONE scan, same signatures (checked
    against an independent numpy computation of the sign bits)."""
    n_tables, n_bits, dim = 5, 6, 64
    sig_df = SIM.srp_signatures(emb, seed=7, n_tables=n_tables,
                                n_bits=n_bits, dim=dim)
    plan = sig_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan

    got = sig_df.toPandas().pivot(index="n_id", columns="tbl", values="sig")
    pdf = emb.toPandas().sort_values("vec_id")
    vecs = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    planes = SIM.hyperplanes(7, n_tables, n_bits, dim)
    for t in range(n_tables):
        signs = (vecs @ planes[t].T >= 0).astype(np.int64)  # (N, n_bits)
        want = np.zeros(len(vecs), dtype=np.int64)
        for b in range(n_bits):
            want = want * 2 + signs[:, b]
        np.testing.assert_array_equal(
            got.loc[pdf["vec_id"].to_numpy(), t].to_numpy(), want
        )


def test_embedding_near_dups_threshold(spark, emb):
    out = SIM.embedding_near_dups(emb.limit(300), sim_threshold=0.9)
    pdf = out.toPandas()
    if len(pdf):
        assert (pdf["sim"] >= 0.9).all()
        assert (pdf["id_a"] < pdf["id_b"]).all()


def test_multimodal_plumbing(spark):
    media = M.synth_media(spark, n=30)
    feats = M.extract_features(media, dim=8).toPandas()
    assert len(feats) == 30
    assert all(len(f) == 8 for f in feats["feature"])
    # deterministic: rerun equal
    feats2 = M.extract_features(media, dim=8).toPandas()
    a = np.array(feats.sort_values("media_id")["feature"].tolist())
    b = np.array(feats2.sort_values("media_id")["feature"].tolist())
    assert (a == b).all()

    frames = M.sample_frames(media, every_nth=2).toPandas()
    assert (frames["frame_idx"] % 2 == 0).all()
    # frame digests come from the REAL Y4M decode: recompute one directly
    import hashlib

    vrow = media.where("kind = 'video'").limit(1).collect()[0]
    fr, _fps = M.decode_y4m(bytes(vrow["payload"]))
    got0 = frames[
        (frames["media_id"] == vrow["media_id"]) & (frames["frame_idx"] == 0)
    ].iloc[0]
    assert got0["digest"] == hashlib.md5(fr[0].tobytes().hex().encode()).hexdigest()
    assert got0["frame_bytes"] == fr[0].size

    rs = M.resize_meta(media, max_w=32).toPandas()
    vis = rs["width"] > 0
    assert (rs.loc[vis, "new_width"] <= 32).all()
    assert rs.loc[~vis, "new_width"].isna().all()  # audio: no resize plan

    # r3: no stub boundary left — strict decode passes for ALL kinds,
    # unknown kinds still raise
    assert M.extract_features(media, strict=True).count() == 30
    weird = spark.createDataFrame(
        [(0, "hologram", bytearray(b"xx"), (0, 0, 0, 0))], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception):
        M.extract_features(weird, strict=True).collect()


def test_lang_id_separates_seeded_languages(spark):
    """VERDICT r2 next-step #6: lang_pred distinguishes the seeded
    non-English fixture docs — every en/fr/de/es doc classified correctly,
    stopword-free docs -> 'unk'."""
    from spinterps_spark import queries as Q

    out = Q.queries()["lang_id"](spark, "/root/testdata/sf0.01").toPandas()
    assert set(out["lang_true"]) == {
        "en", "fr", "de", "es", "zh", "ja", "ru", "ar", "ko", "unk"
    }
    acc = (out["lang_pred"] == out["lang_true"]).mean()
    assert acc == 1.0, out[out["lang_pred"] != out["lang_true"]].head()


def test_wav_codec_matches_stdlib_wave():
    """The pure-struct WAV writer/parser agrees with the stdlib `wave`
    module in both directions (independent implementation of the spec)."""
    import io
    import wave

    rng = np.random.RandomState(7)
    samples = rng.randint(-(2**15), 2**15, 200).astype(np.int16)

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes(samples.tobytes())
    w.close()
    s, sr = M.decode_wav(buf.getvalue())
    assert sr == 16000 and (s == samples).all()

    r = wave.open(io.BytesIO(M.synth_wav(samples)), "rb")
    assert (r.getnchannels(), r.getsampwidth(), r.getframerate()) == (1, 2, 16000)
    back = np.frombuffer(r.readframes(r.getnframes()), dtype="<i2")
    assert (back == samples).all()

    with pytest.raises(ValueError):
        M.decode_wav(b"not a wav at all........")


def test_bmp_codec_roundtrip_including_padding_and_topdown():
    """decode_bmp is a real parser: roundtrips odd widths (non-zero stride
    padding), accepts top-down negative-height bitmaps, rejects non-BMP."""
    import struct

    rng = np.random.RandomState(3)
    for w, h in [(7, 5), (4, 4), (13, 1), (32, 9)]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        back = M.decode_bmp(M.synth_bmp(px))
        np.testing.assert_array_equal(back, px)

    # top-down variant: negate height, rows in natural order
    px = rng.randint(0, 256, (3, 6, 3)).astype(np.uint8)
    payload = bytearray(M.synth_bmp(px[::-1]))  # synth writes bottom-up
    payload[14 + 8 : 14 + 12] = struct.pack("<i", -3)
    np.testing.assert_array_equal(M.decode_bmp(bytes(payload)), px[::-1][::-1])

    with pytest.raises(ValueError):
        M.decode_bmp(b"PNG\x00" * 30)
    with pytest.raises(ValueError):
        M.decode_bmp(M.synth_bmp(px[::-1])[:40])  # truncated


def test_y4m_codec_roundtrip():
    """decode_y4m is a real parser: roundtrips multi-frame mono streams,
    tolerates FRAME-level parameters, rejects non-mono and garbage."""
    rng = np.random.RandomState(4)
    fr = rng.randint(0, 256, (4, 6, 10)).astype(np.uint8)
    back, fps = M.decode_y4m(M.synth_y4m(fr, fps=30))
    assert fps == 30
    np.testing.assert_array_equal(back, fr)

    # rational frame rates round to the nearest integer (NTSC 29.97)
    ntsc = M.synth_y4m(fr, fps=25).replace(b"F25:1", b"F30000:1001")
    assert M.decode_y4m(ntsc)[1] == 30

    # frame-level parameters after the FRAME marker are legal per spec
    one = fr[:1]
    payload = M.synth_y4m(one).replace(b"FRAME\n", b"FRAME Xq=1\n")
    np.testing.assert_array_equal(M.decode_y4m(payload)[0], one)

    with pytest.raises(ValueError):
        M.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n" + b"\x00" * 64)
    with pytest.raises(ValueError):
        M.decode_y4m(b"RIFF....")


def test_image_video_features_match_direct_decode(spark):
    """extract_features' image/video lanes equal a direct numpy decode of
    the same payload bytes (the features are real, not byte moments)."""
    media = M.synth_media(spark, n=30)
    out = M.extract_features(media, dim=8, strict=True).toPandas()
    rows = {r["media_id"]: r for _, r in out.iterrows()}

    irow = media.where("kind = 'image'").limit(1).collect()[0]
    px = M.decode_bmp(bytes(irow["payload"])).astype(np.int64)
    f = np.array(rows[irow["media_id"]]["feature"], dtype=np.float32)
    h, w, _ = px.shape
    assert f[0] == np.float32(w) and f[1] == np.float32(h)
    assert f[2] == np.float32(int(px[:, :, 0].sum()) / (w * h))
    assert f[5] == np.float32(px.min()) and f[6] == np.float32(px.max())

    vrow = media.where("kind = 'video'").limit(1).collect()[0]
    fr, _ = M.decode_y4m(bytes(vrow["payload"]))
    g = np.array(rows[vrow["media_id"]]["feature"], dtype=np.float32)
    nf, vh, vw = fr.shape
    a = fr.astype(np.int64)
    assert g[2] == np.float32(nf)
    assert g[3] == np.float32(int(a.sum()) / (nf * vh * vw))
    assert g[6] == np.float32(int(a[0].sum()) / (vh * vw))


def test_audio_decode_is_real_and_strict_passes(spark):
    """VERDICT r2 next-step #5: strict=True succeeds on audio-only media
    (real RIFF/WAVE PCM16 decode), and features match a direct decode."""
    media = M.synth_media(spark, n=30)
    audio = media.where("kind = 'audio'")
    out = M.extract_features(audio, strict=True).toPandas()
    assert len(out) == 10

    row = audio.limit(1).collect()[0]
    s, sr = M.decode_wav(bytes(row["payload"]))
    got = np.array(
        out[out["media_id"] == row["media_id"]]["feature"].iloc[0],
        dtype=np.float32,
    )
    n = len(s)
    a = s.astype(np.int64)
    assert got[0] == np.float32(n)
    assert got[1] == np.float32(sr)
    assert got[3] == np.float32(np.sqrt(int((a * a).sum()) / n))
    assert got[5] == np.float32(int(np.abs(a).max()))


def _winnow_py(text, k=4, w=4):
    """Independent winnowing reference (hashlib + plain loops)."""
    import hashlib

    M, B = 1_000_000_007, 131
    toks = text.split(" ")
    tv = [int(hashlib.md5(t.encode()).hexdigest()[:12], 16) % M for t in toks]
    if len(tv) < k:
        return set()
    gh = []
    for i in range(len(tv) - k + 1):
        h = 0
        for x in tv[i:i + k]:
            h = (h * B + x) % M
        gh.append(h)
    sel = set()
    n_wins = max(len(gh) - w + 1, 1)
    for i in range(n_wins):
        win = gh[i:i + w]
        mh, mp = M, -1
        for j, h in enumerate(win):
            if h <= mh:
                mh, mp = h, i + j + 1  # rightmost min, 1-based gram pos
        sel.add((mp, mh))
    return sel


def test_winnow_fingerprints_match_reference_and_guarantee(spark):
    """winnow_fingerprints equals an independent Python winnowing
    implementation, drops sub-k docs, and upholds the SIGMOD'03 guarantee:
    docs sharing a >= w+k-1 token run share a fingerprint."""
    texts = [
        "a b c d e f g h i j",
        "zz yy a b c d e f g h i j qq",   # shares a 10-token run with doc 0
        "x y z",                            # sub-k: no grams, no rows
        "p q r s",                          # exactly one gram, one window
        "m m m m m m m m",                  # all-equal hashes: tie rule
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        D.winnow_fingerprints(spark.createDataFrame(pdf), k=4, w=4)
        .toPandas()
    )
    got = {
        int(i): set(zip(g["fp_pos"], g["fp_hash"]))
        for i, g in out.groupby("doc_id")
    }
    for i, t in enumerate(texts):
        want = _winnow_py(t)
        assert got.get(i, set()) == want, (i, got.get(i), want)
    # shared-run guarantee: some fingerprint HASH appears in both docs
    h0 = {h for _, h in got[0]}
    h1 = {h for _, h in got[1]}
    assert h0 & h1
    assert 2 not in got  # sub-k doc yields no rows


def test_connected_components_vs_union_find(spark):
    """Min-label propagation equals an independent union-find on a graph
    with a long chain (multi-round convergence), a star, an isolated pair,
    and a cycle; max_iters=1 on the chain raises instead of returning a
    partial labeling."""
    edges = (
        [(i, i + 1) for i in range(10, 18)]       # chain 10..18
        + [(30, 31), (30, 32), (30, 33)]           # star
        + [(50, 51)]                               # pair
        + [(70, 71), (71, 72), (72, 70)]           # cycle
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = (
        D.connected_components(pairs).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    assert dict(zip(got["doc_id"], got["component"])) == want
    # every component label is its minimum member
    comp = got.groupby("component")["doc_id"].min()
    assert (comp.index == comp.values).all()

    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(
            spark.createDataFrame(edges[:8], "doc_a long, doc_b long"),
            max_iters=1,
        )


# ---------------------------------------------------- trained IVF (r4)

def _ivf_recall(spark, vec_pdf, centroids, k=10, n_probe=4, n_q=12):
    """Recall@k of cosine_topk_ivf vs brute force on a pandas fixture."""
    df = spark.createDataFrame(vec_pdf)
    q = df.where(F.col("vec_id") < n_q).withColumnRenamed("vec_id", "q_id")
    exact = SIM.cosine_topk_bruteforce(df, q, k=k).toPandas()
    approx = SIM.cosine_topk_ivf(
        df, q, k=k, n_lists=16, n_probe=n_probe, centroids=centroids
    ).toPandas()
    e = set(map(tuple, exact[["q_id", "n_id"]].to_numpy()))
    a = set(map(tuple, approx[["q_id", "n_id"]].to_numpy()))
    return len(e & a) / len(e)


@pytest.fixture(scope="module")
def clustered_vecs():
    """Seeded 16-cluster fixture on the unit sphere — data with real
    structure, the case a trained quantizer exists for (near-uniform
    random vectors have no structure for k-means to learn)."""
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, 16, size=600)
    Y = centers[lab] * 3.0 + rng.normal(size=(600, 64)) * 0.6
    return pd.DataFrame(
        {"vec_id": np.arange(600), "embedding": [list(map(float, y)) for y in Y]}
    )


def test_ivf_trained_centroids_beat_sampling_init(spark, clustered_vecs):
    """VERDICT r3 next-step #2 'done' gate: recall@10 with k-means-trained
    centroids strictly above the sampling-init recall on the seeded
    clustered fixture, at the SAME n_probe (scanned fraction comparable —
    training must win on quantizer quality, not by scanning more)."""
    X = np.array(clustered_vecs["embedding"].tolist(), dtype=np.float64)
    trained = [list(map(float, c)) for c in SIM.kmeans_spherical(X, 16, 5, 11)]
    sampling = [list(map(float, x)) for x in X[:16]]
    r_trained = _ivf_recall(spark, clustered_vecs, trained)
    r_sampling = _ivf_recall(spark, clustered_vecs, sampling)
    assert r_trained > r_sampling, (r_trained, r_sampling)
    assert r_trained >= 0.9, r_trained


def test_train_ivf_centroids_matches_numpy_core(spark, emb):
    """The DataFrame-facing trainer (hash-sample + collect + Lloyd) equals
    the raw numpy core when the table fits under sample_max — same sorted
    input, same seed, bit-identical centroids."""
    got = SIM.train_ivf_centroids(emb, n_lists=8, n_iters=3, seed=11)
    pdf = emb.toPandas().sort_values("vec_id")
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    want = SIM.kmeans_spherical(X, n_lists=8, n_iters=3, seed=11)
    np.testing.assert_array_equal(np.array(got, dtype=np.float64), want)


def test_ivf_model_parquet_drift_alarm():
    """The committed trained-centroid model must equal a fresh
    regeneration from the embeddings parquet (same guarantee
    tests/test_golden.py gives the kernel goldens)."""
    import os
    import tempfile

    from spinterps_spark import queries as Q

    sf = "/root/testdata/sf0.01"
    committed = pd.read_parquet(Q.ivf_model_path(sf))
    X = np.array(
        pd.read_parquet(f"{sf}/embeddings.parquet")
        .sort_values("vec_id")["embedding"].tolist(),
        dtype=np.float64,
    )
    fresh = SIM.kmeans_spherical(
        X, n_lists=Q.IVF_P["n_lists"], n_iters=Q.IVF_P["n_iters"],
        seed=Q.IVF_P["seed"],
    )
    np.testing.assert_array_equal(
        np.array(committed.sort_values("list_id")["c_emb"].tolist()), fresh
    )


def test_star_components_path_graph_log_rounds(spark):
    """VERDICT r3 next-step #4 'done' gate: large-star/small-star on a
    10,000-node PATH graph (diameter 9,999 — the min-label worst case)
    must converge within 2*log2(n) rounds (max_iters encodes the bound:
    the operator raises if exceeded) with labels equal to union-find
    (trivially component 0 for a path over 0..n-1)."""
    import math

    n = 10_000
    edges = spark.range(n - 1).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    bound = math.ceil(2 * math.log2(n))  # 27
    got = (
        D.connected_components(edges, max_iters=bound, algorithm="star")
        .toPandas()
    )
    assert len(got) == n
    assert (got["component"] == 0).all()


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (3, 500, 800),    # many mid-size components
    (7, 200, 120),    # sparse: mostly isolated pairs/singletons
    (11, 80, 400),    # dense: one giant component expected
])
def test_star_components_match_minlabel_and_union_find(spark, seed, n_nodes, n_edges):
    """star and minlabel agree with each other and with union-find on
    seeded random graphs across density regimes (sparse pairs, mid-size
    mixtures, one giant component)."""
    rng = np.random.default_rng(seed)
    ed = np.unique(
        np.sort(rng.integers(0, n_nodes, size=(n_edges, 2)), axis=1), axis=0
    )
    ed = ed[ed[:, 0] != ed[:, 1]]
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": ed[:, 0], "doc_b": ed[:, 1]})
    )
    star = D.connected_components(pairs, algorithm="star").toPandas()
    minl = D.connected_components(pairs, algorithm="minlabel").toPandas()

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in ed:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    assert dict(zip(star["doc_id"], star["component"])) == want
    assert dict(zip(minl["doc_id"], minl["component"])) == want

    with pytest.raises(ValueError, match="unknown algorithm"):
        D.connected_components(pairs, algorithm="bogus")


def test_winnow_candidates_find_every_planted_overlap(spark):
    """Winnowing guarantee (SIGMOD'03 Thm: any match of length >= w+k-1
    shares a fingerprint) lifted to the candidate generator: every planted
    pair sharing a >= w+k-1-token run MUST appear in winnow_candidates
    output — deterministic recall, unlike LSH."""
    k = w = 4
    run_len = w + k - 1  # 7 tokens
    rng = np.random.RandomState(17)
    vocab = [f"tok{i}" for i in range(500)]
    planted_run = [f"run{i}" for i in range(run_len)]
    rows, planted_pairs = [], []
    doc_id = 0
    for g in range(10):
        # two docs per group share the planted run at random offsets
        a_id, b_id = doc_id, doc_id + 1
        for did in (a_id, b_id):
            toks = [vocab[rng.randint(len(vocab))] for _ in range(40)]
            off = int(rng.randint(0, len(toks) - run_len))
            toks[off:off + run_len] = [f"g{g}{t}" for t in planted_run]
            rows.append((did, " ".join(toks)))
        planted_pairs.append((a_id, b_id))
        doc_id += 2
    # plus unrelated noise docs
    for _ in range(20):
        rows.append((doc_id, " ".join(vocab[rng.randint(len(vocab))] for _ in range(40))))
        doc_id += 1
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = D.winnow_candidates(docs, k=k, w=w).toPandas()
    got = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    missing = [p for p in planted_pairs if p not in got]
    assert not missing, missing
    # verification stage really ran: every planted pair has n_inter > 0
    pl = out.set_index(["doc_a", "doc_b"]).loc[planted_pairs]
    assert (pl["n_inter"] > 0).all()
    assert (pl["n_shared_fps"] >= 1).all()


def test_winnow_candidates_stop_fingerprint_cap(spark):
    """max_bucket drops boilerplate fingerprints shared by > max_bucket
    docs (bounding pair fan-out) while genuinely-rare overlaps survive."""
    boiler = " ".join(f"lic{i}" for i in range(12))  # shared by ALL docs
    rare = " ".join(f"rare{i}" for i in range(12))   # shared by docs 0,1
    rows = []
    for did in range(12):
        noise = " ".join(f"n{did}_{j}" for j in range(20))
        text = f"{boiler} {noise} {rare}" if did < 2 else f"{boiler} {noise}"
        rows.append((did, text))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    uncapped = D.winnow_candidates(docs, k=4, w=4).toPandas()
    capped = D.winnow_candidates(docs, k=4, w=4, max_bucket=4).toPandas()
    # boilerplate links every pair when uncapped; the cap removes them
    assert len(uncapped) == 12 * 11 // 2
    got = set(map(tuple, capped[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in got                       # the rare overlap survives
    assert len(got) < len(uncapped)            # boilerplate pairs gone
    assert all(a < 2 and b < 2 for a, b in got), got


def test_lsh_candidate_pairs_max_bucket_cap(spark):
    """VERDICT r4 next-step #2: a boilerplate mega-bucket (12 identical
    docs -> one (band, minhash) bucket of 12 in every band) is dropped by
    max_bucket before the self-join, bounding the quadratic fan-out, while
    a rare near-dup pair in its own small bucket survives exactly."""
    boiler = " ".join(f"b{i}" for i in range(30))
    rare = " ".join(f"r{i}" for i in range(30))
    rows = [(d, boiler) for d in range(12)] + [(100, rare), (101, rare)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sig = D.minhash_signatures(docs, n_bands=4)
    uncapped = D.lsh_candidate_pairs(sig, min_bands=2).toPandas()
    capped = D.lsh_candidate_pairs(sig, min_bands=2, max_bucket=4).toPandas()
    assert len(uncapped) == 12 * 11 // 2 + 1
    got = set(map(tuple, capped[["doc_a", "doc_b"]].to_numpy()))
    assert got == {(100, 101)}
    # the surviving pair still agrees on every band
    assert (capped["n_bands"] == 4).all()


def test_lsh_skew_zipf_mega_cluster_bounded(spark):
    """VERDICT r4 next-step #7: a Zipf-skewed near-dup corpus — one
    1000-doc boilerplate mega-cluster plus a tail of genuine near-dup
    clusters — must flow through the candidate stage with BOUNDED fan-out.
    The engineered defense is layered: the max_bucket stop key drops the
    mega-bucket before the self-join (candidate count = exactly the tail
    clusters' pairs, not C(1000,2) ~ 500k), the exact-dedup path still
    collapses the identical mega-group (it shuffles on md5, one row per
    group, skew-immune), and star components finish the tail in O(log)
    rounds."""
    sizes = [1000, 50, 20, 10, 5, 3, 2]  # Zipf-ish cluster spectrum
    rows, doc_id = [], 0
    for c, size in enumerate(sizes):
        text = " ".join(f"c{c}tok{i}" for i in range(40))
        for _ in range(size):
            rows.append((doc_id, text))
            doc_id += 1
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    sig = D.minhash_signatures(docs, n_bands=4)

    capped = D.lsh_candidate_pairs(sig, min_bands=2, max_bucket=64).toPandas()
    tail_pairs = sum(s * (s - 1) // 2 for s in sizes[1:])
    assert len(capped) == tail_pairs  # mega-cluster never reached the join
    # every tail cluster fully paired and agreeing on all bands
    assert (capped["n_bands"] == 4).all()

    # identical mega-group is the EXACT path's job: one row per content
    # group regardless of group size (groupBy(md5) — two-phase partial
    # aggregation, no quadratic stage)
    ex = D.exact_dedup(docs).toPandas()
    assert len(ex) == len(sizes)
    assert int(ex["n_docs"].max()) == 1000
    assert int(ex.loc[ex["n_docs"].idxmax(), "keep_id"]) == 0

    # star components over the capped pairs: tail clusters collapse to
    # their min ids in logarithmic rounds
    comp = D.connected_components(
        capped[["doc_a", "doc_b"]].pipe(spark.createDataFrame),
        algorithm="star",
    ).toPandas()
    want_roots = {}
    start = sizes[0]
    for s in sizes[1:]:
        for d in range(start, start + s):
            want_roots[d] = start
        start += s
    got = dict(zip(comp["doc_id"], comp["component"]))
    assert got == want_roots


def test_pii_redact_detects_every_planted_item(spark):
    """Detection accuracy on the planted-PII fixture: regex counts equal
    the planted ground truth on EVERY doc (no false positives from clean
    content, no cross-kind bleed), and redacted text contains no
    residual PII match."""
    from spinterps_spark import queries as Q
    from spinterps_spark.functions.redact import PII_RULES, redact_col
    from spinterps_spark.sources import fixtures as FX

    out = Q.queries()["pii_redact"](spark, "/root/testdata/sf0.01").toPandas()
    for kind in ("email", "card", "phone", "ipv4"):
        bad = out[out[f"n_{kind}"] != out[f"true_{kind}"]]
        assert bad.empty, (kind, bad.head())
    assert (out["true_email"] + out["true_card"]
            + out["true_phone"] + out["true_ipv4"]).sum() > 50

    d = spark.read.parquet(FX.pii_docs_path())
    red = d.select(redact_col(F.col("text")).alias("t"))
    for _name, pat, _repl in PII_RULES:
        residual = red.where(F.regexp_count("t", F.lit(pat)) > 0).count()
        assert residual == 0, _name


def test_pii_redact_adjacent_phone_and_ip(spark):
    """Review r4 regression test: a phone immediately followed by an IPv4
    must redact to '<PHONE> <IP>' — the r4.0 rule order let the phone's
    greedy trailing digits eat the first octet ('<PHONE>.2.3.4')."""
    from spinterps_spark.functions.redact import redact_col

    d = spark.createDataFrame(
        [(1, "call +7 123 4567 1.2.3.4 now")], "doc_id long, text string"
    )
    got = d.select(redact_col(F.col("text")).alias("t")).collect()[0]["t"]
    assert got == "call <PHONE> <IP> now", got
