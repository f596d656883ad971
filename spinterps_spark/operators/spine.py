"""Time-spine join (SURVEY.md J2): make gaps explicit as NULL-metric rows.

Reference analog: `reindex(pd.date_range(beg, end, freq))` against the
station frame (interp/prepare.py:539-543, 720-723) — missing steps become
NaN rows that the interpolator then fills.

Spark-first design: the spine is generated *per conversation* over that
conversation's own [first_bucket, last_bucket] span with `sequence()` +
`explode()` — never a global calendar × all-convs cross join, which at
10^12-turn scale would materialize mostly-empty rows for short-lived
conversations. The sequence explode is JVM-side (whole-stage codegen), and
the spine→agg join is an equi-join on (conv_id, bucket_ts) that AQE plans
as a shuffle join co-partitioned with the rollup output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spinterps_spark import METRIC_COLS, TIER_SECONDS


def conv_spine(rollup: DataFrame, tier: str) -> DataFrame:
    """One row per (conv_id, bucket_ts) for every tier-aligned bucket between
    each conversation's first and last observed bucket."""
    secs = TIER_SECONDS[tier]
    bounds = rollup.groupBy("conv_id").agg(
        F.min("bucket_ts").alias("_first"), F.max("bucket_ts").alias("_last")
    )
    return bounds.select(
        "conv_id",
        F.explode(
            F.sequence(
                "_first", "_last", F.expr(f"INTERVAL {secs} SECOND")
            )
        ).alias("bucket_ts"),
    )


def with_spine(rollup: DataFrame, tier: str) -> DataFrame:
    """Left-join rollup onto its spine; absent buckets become NULL-metric
    rows with valid=false (the long-format equivalent of the reference's
    NaN cells)."""
    spine = conv_spine(rollup, tier)
    joined = spine.join(rollup, ["conv_id", "bucket_ts"], "left")
    return joined.select(
        "conv_id",
        "bucket_ts",
        *METRIC_COLS,
        F.coalesce(F.col("valid"), F.lit(False)).alias("valid"),
    )
