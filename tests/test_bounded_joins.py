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
