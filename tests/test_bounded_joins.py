"""Scale-safety regressions for VERDICT r1 'What's wrong #3/#4': the as-of
infill and the all-neighbor IDW pair builder must never materialize
O(gaps x refs) pairs per key. Both are checked for (a) exact value parity
with the naive unbounded formulation and (b) bounded pair counts on a
synthetic mega-series."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window as W, functions as F

from spinterps_spark.operators.neighbors import horizon_pairs
from spinterps_spark.operators.spine import nearest_asof_fill

H = 24 * 3600


@pytest.fixture(scope="module")
def mega(spark):
    """One mega-conversation: 60 days of hourly buckets, refs on even hours,
    gaps on odd hours -> 720 gaps x 720 refs = 518k naive pairs."""
    t0 = 1_700_000_000
    ts = t0 + np.arange(0, 60 * 24) * 3600
    pdf = pd.DataFrame({"conv_id": "mega", "t": ts})
    pdf["is_ref"] = (np.arange(len(pdf)) % 2) == 0
    pdf["v"] = np.where(pdf["is_ref"], np.round(np.sin(ts / 9999.0) * 10, 2), np.nan)
    return spark.createDataFrame(pdf)


def test_horizon_pairs_bounded_and_exact(spark, mega):
    gaps = mega.where(~F.col("is_ref")).select("conv_id", F.col("t").alias("gt"))
    refs = mega.where(F.col("is_ref")).select("conv_id", F.col("t").alias("rt"), "v")
    got = horizon_pairs(gaps, refs, H, key="conv_id").toPandas()

    n_gaps = gaps.count()
    n_refs = refs.count()
    # bounded: <= gaps * (refs within +-24h of any gap = 24+1) -- never G*R
    assert len(got) <= n_gaps * (24 + 1)
    assert len(got) < 0.1 * n_gaps * n_refs

    # exact: same pair set as the naive unbounded join, each pair once
    naive = (
        gaps.join(refs, "conv_id")
        .where(F.abs(F.col("gt") - F.col("rt")) <= H)
        .toPandas()
    )
    key = lambda d: set(zip(d["gt"], d["rt"]))
    assert key(got) == key(naive)
    assert len(got) == len(naive)  # no duplicate memberships

    # refs-side explode (VERDICT r2 #3): identical pair set, each once
    got_r = horizon_pairs(
        gaps, refs, H, key="conv_id", explode_side="refs"
    ).toPandas()
    assert key(got_r) == key(naive)
    assert len(got_r) == len(naive)


def test_empirical_variogram_pair_join_bounded_and_exact(spark, mega):
    """VERDICT r2 'What's wrong #1': the within-conversation variogram pair
    join must carry the horizon bucket in its equi keys (so a mega
    conversation costs O(B * rows_per_horizon), spread over B join keys) and
    the binned output must equal the naive enumeration exactly."""
    from spinterps_spark.operators.variogram import empirical_variogram

    ser = mega.select(
        "conv_id", F.to_timestamp(F.from_unixtime("t")).alias("bucket_ts"), "v"
    )
    coords = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["mega"], "cluster_id": [0]})
    )
    evg = empirical_variogram(
        ser, coords, "v", max_lag=H, lag_width=3600.0, estimator="mean"
    )
    got = evg.toPandas().sort_values("bin").reset_index(drop=True)

    # plan shape: equi-join on (conv_id, _hb), never a per-conv nested loop
    plan = evg._jdf.queryExecution().executedPlan().toString()
    assert "_hb" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # exact parity with the naive O(n^2) enumeration
    pdf = mega.toPandas()
    refs = pdf[pdf["is_ref"]].reset_index(drop=True)
    t = refs["t"].to_numpy(np.int64)
    z = refs["v"].to_numpy(np.float64)
    dt = t[None, :] - t[:, None]
    iu, ju = np.nonzero((dt > 0) & (dt <= H))
    h = (t[ju] - t[iu]).astype(np.float64)
    sq = (z[iu] - z[ju]) ** 2
    bins = np.floor(h / 3600.0).astype(np.int64)
    want_n = pd.Series(bins).value_counts().sort_index()
    assert list(got["bin"]) == list(want_n.index)
    assert list(got["n_pairs"]) == list(want_n.values)
    for b_id, grp_gamma in got[["bin", "gamma"]].itertuples(index=False):
        m = bins == b_id
        assert np.isclose(grp_gamma, 0.5 * sq[m].mean(), rtol=1e-9)
    # output pair count itself is lag-bounded: each ref pairs only with the
    # refs inside one horizon, never with all of them
    per_horizon = int(H // (2 * 3600))  # refs every 2h
    assert int(got["n_pairs"].sum()) <= len(refs) * per_horizon


def test_ks_rep_sample_memoized(spark, monkeypatch):
    """VERDICT r2 'What's wrong #3': representative weight samples are
    computed O(C + merges) times, not once per comparison."""
    from spinterps_spark.operators import variogram as V

    calls = {"n": 0}
    real = V._ok_weight_sample

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(V, "_ok_weight_sample", counting)
    dim = pd.DataFrame(
        {
            "cluster_id": list(range(6)),
            "vg_str": [
                "1.0 Sph(3600.0)", "1.0 Sph(3605.0)", "9.0 Gau(90000.0)",
                "1.0 Sph(3610.0)", "9.0 Gau(90500.0)", "1.0 Sph(3615.0)",
            ],
        }
    )
    out = V.ks_cluster_variograms(dim)
    n_merges = len(out) - out["merged_id"].nunique()
    # <= one per cluster (candidate sample) + one per distinct rep string
    # (initial + refits after merges); never C^2
    assert calls["n"] <= 2 * len(dim) + n_merges
    # determinism unchanged by the memo
    out2 = V.ks_cluster_variograms(dim)
    assert out.equals(out2)


def test_nearest_asof_fill_matches_ranked_join(spark, mega):
    sp = mega.select(
        "conv_id", F.to_timestamp(F.from_unixtime("t")).alias("bucket_ts"), "v"
    )
    got = (
        nearest_asof_fill(sp, "v", key_col="conv_id")
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    # naive ranked-join oracle: rank refs by (|dt|, rt) per gap
    gaps = sp.where(F.col("v").isNull()).select(
        "conv_id", "bucket_ts", F.unix_timestamp("bucket_ts").alias("gt")
    )
    refs = sp.where(F.col("v").isNotNull()).select(
        "conv_id", F.unix_timestamp("bucket_ts").alias("rt"), "v"
    )
    j = gaps.join(refs, "conv_id")
    w = W.partitionBy("conv_id", "gt").orderBy(F.abs(F.col("gt") - F.col("rt")), "rt")
    want = (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "bucket_ts", F.col("v").alias("v_filled"),
            F.abs(F.col("gt") - F.col("rt")).alias("dist_sec"),
        )
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert (got["v_filled"].to_numpy() == want["v_filled"].to_numpy()).all()
    assert (got["dist_sec"].to_numpy() == want["dist_sec"].to_numpy()).all()


def test_nearest_asof_tie_takes_earlier(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "bucket_ts": pd.to_datetime([0, 3600, 7200], unit="s"),
            "v": [1.0, np.nan, 2.0],
        }
    )
    out = nearest_asof_fill(spark.createDataFrame(pdf), "v").toPandas()
    assert len(out) == 1
    assert out["v_filled"].iloc[0] == 1.0  # equidistant -> earlier ref
    assert out["dist_sec"].iloc[0] == 3600


def test_nearest_asof_edges(spark):
    """Leading/trailing gaps take the only available side."""
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 4,
            "bucket_ts": pd.to_datetime([0, 3600, 7200, 10800], unit="s"),
            "v": [np.nan, 5.0, np.nan, np.nan],
        }
    )
    out = (
        nearest_asof_fill(spark.createDataFrame(pdf), "v")
        .toPandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    assert (out["v_filled"] == 5.0).all()
    assert list(out["dist_sec"]) == [3600, 3600, 7200]
