"""Tier rollup: bucket transcripts into 1m/1h/1d continuous aggregates.

Reference semantics grafted (SURVEY.md A2):
- temporal downsample with min-count validity: a bucket is valid only if the
  number of contributing units >= min_cnt, otherwise its metrics are NULL
  (reference `resample(res).sum()` * 0/1 validity mask,
  utils/rsmp_nc_in_time.py:300-350).
- every metric is an exact-compose sum/count (no ratios, no variance), so the
  salted two-phase aggregation is bit-identical to a single-phase groupBy
  (SURVEY.md §4 O6 — the reference's strided-index reshuffle for worker load
  balance, variograms/fitvgs.py:60-82, re-expressed as key salting).

Scale notes (100 TB):
- phase 1 aggregates on (conv_id, bucket_ts, salt): the map-side partial
  aggregation plus the salt cap the per-reducer row count even for a
  mega-conversation whose every turn lands in one (conv, bucket) pair.
- phase 2 merges the <= n_salt partials per (conv_id, bucket_ts): tiny.
- tier N+1 rolls up from tier N output (never from raw), so the 1d pass reads
  ~1/60th of what the 1h pass read — the cascade is the cheap path at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from spinterps_spark import METRIC_COLS, TIER_SECONDS

# default validity: a bucket needs at least this many contributing
# lower-tier units to be valid (reference min_cnt knob).
DEFAULT_MIN_CNT = {"1m": 1, "1h": 1, "1d": 1}


def bucket_ts_col(ts_col, tier: str, shift_seconds: int = 0):
    """Tier-aligned bucket timestamp (epoch-truncated, timezone-free math
    so it is reproducible in any SQL engine). shift_seconds is the
    reference's `tme_dla` time-delta: the series is shifted BEFORE
    bucketing (utils/rsmp_nc_in_time.py:276-277)."""
    secs = TIER_SECONDS[tier]
    epoch = F.unix_timestamp(ts_col) + F.lit(int(shift_seconds))
    return F.timestamp_seconds((epoch / secs).cast("long") * secs)


def base_rollup(
    transcripts: DataFrame,
    tier: str = "1m",
    n_salt: int = 16,
    min_cnt: int | None = None,
    shift_seconds: int = 0,
) -> DataFrame:
    """Raw turns -> base-tier aggregates via salted two-phase aggregation.

    Output: (conv_id, bucket_ts, turn_cnt, tok_len_sum, tool_call_cnt,
    role_user_cnt, role_assistant_cnt, role_tool_cnt, valid)
    """
    if min_cnt is None:
        min_cnt = DEFAULT_MIN_CNT[tier]

    t = transcripts
    enriched = t.select(
        "conv_id",
        bucket_ts_col(F.col("ts"), tier, shift_seconds).alias("bucket_ts"),
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_salt)).alias("_salt"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("_tok_len"),
        F.col("tool").isNotNull().cast("long").alias("_is_tool_call"),
        (F.col("role") == "user").cast("long").alias("_is_user"),
        (F.col("role") == "assistant").cast("long").alias("_is_assistant"),
        (F.col("role") == "tool").cast("long").alias("_is_tool"),
    )

    # phase 1: partial aggregate per (conv, bucket, salt) — map-side combine
    # plus salt splits mega-conversation hot buckets across reducers.
    phase1 = enriched.groupBy("conv_id", "bucket_ts", "_salt").agg(
        F.count(F.lit(1)).alias("turn_cnt"),
        F.sum("_tok_len").alias("tok_len_sum"),
        F.sum("_is_tool_call").alias("tool_call_cnt"),
        F.sum("_is_user").alias("role_user_cnt"),
        F.sum("_is_assistant").alias("role_assistant_cnt"),
        F.sum("_is_tool").alias("role_tool_cnt"),
    )

    # phase 2: merge partials (exact — all metrics are sums/counts).
    phase2 = phase1.groupBy("conv_id", "bucket_ts").agg(
        *[F.sum(c).alias(c) for c in METRIC_COLS]
    )

    return phase2.withColumn("valid", F.col("turn_cnt") >= F.lit(min_cnt))


def single_phase_rollup(transcripts: DataFrame, tier: str = "1m", min_cnt: int = 1) -> DataFrame:
    """Unsalted single-phase rollup — equality witness for the salted path
    (SURVEY.md §5.2 invariant 'salted two-phase agg equals unsalted')."""
    t = transcripts.select(
        "conv_id",
        bucket_ts_col(F.col("ts"), tier).alias("bucket_ts"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("_tok_len"),
        F.col("tool").isNotNull().cast("long").alias("_is_tool_call"),
        (F.col("role") == "user").cast("long").alias("_is_user"),
        (F.col("role") == "assistant").cast("long").alias("_is_assistant"),
        (F.col("role") == "tool").cast("long").alias("_is_tool"),
    )
    out = t.groupBy("conv_id", "bucket_ts").agg(
        F.count(F.lit(1)).alias("turn_cnt"),
        F.sum("_tok_len").alias("tok_len_sum"),
        F.sum("_is_tool_call").alias("tool_call_cnt"),
        F.sum("_is_user").alias("role_user_cnt"),
        F.sum("_is_assistant").alias("role_assistant_cnt"),
        F.sum("_is_tool").alias("role_tool_cnt"),
    )
    return out.withColumn("valid", F.col("turn_cnt") >= F.lit(min_cnt))


def rollup_tier(lower: DataFrame, to_tier: str, min_cnt: int | None = None) -> DataFrame:
    """Tier N -> tier N+1: sums compose exactly; validity = number of valid
    lower-tier buckets >= min_cnt (reference month/min-count rule A2 —
    utils/rsmp_nc_in_time.py:303-321: count of contributing steps gates the
    bucket; invalid buckets keep the row but NULL the metrics so the gap is
    visible to the gap-filler).
    """
    if min_cnt is None:
        min_cnt = DEFAULT_MIN_CNT[to_tier]

    valid_rows = lower.where(F.col("valid"))
    up = valid_rows.groupBy(
        "conv_id", bucket_ts_col(F.col("bucket_ts"), to_tier).alias("bucket_ts")
    ).agg(
        *[F.sum(c).alias(c) for c in METRIC_COLS],
        F.count(F.lit(1)).alias("_n_lower"),
    )
    up = up.withColumn("valid", F.col("_n_lower") >= F.lit(min_cnt))
    # invalid bucket => metrics NULL (reference: resampled * NaN mask)
    metric_exprs = [
        F.when(F.col("valid"), F.col(c)).otherwise(F.lit(None)).alias(c)
        for c in METRIC_COLS
    ]
    return up.select("conv_id", "bucket_ts", *metric_exprs, "valid")


def rollup_month(lower_1d: DataFrame, min_cnt: int | str = "days_in_month") -> DataFrame:
    """A2 month rule (utils/rsmp_nc_in_time.py:306-311): a calendar-month
    bucket is valid only when min_cnt lower-tier days contributed, where the
    reference's monthly min count is the NUMBER OF DAYS IN THAT MONTH (i.e.
    a complete month) — per-bucket, not a constant. min_cnt may also be an
    int for a fixed threshold. Input is the 1d tier."""
    valid_rows = lower_1d.where(F.col("valid"))
    up = valid_rows.groupBy(
        "conv_id", F.date_trunc("month", "bucket_ts").alias("bucket_ts")
    ).agg(
        *[F.sum(c).alias(c) for c in METRIC_COLS],
        F.count(F.lit(1)).alias("_n_lower"),
    )
    need = (
        F.dayofmonth(F.last_day("bucket_ts"))
        if min_cnt == "days_in_month" else F.lit(int(min_cnt))
    )
    up = up.withColumn("valid", F.col("_n_lower") >= need)
    metric_exprs = [
        F.when(F.col("valid"), F.col(c)).otherwise(F.lit(None)).alias(c)
        for c in METRIC_COLS
    ]
    return up.select(
        "conv_id", "bucket_ts", *metric_exprs,
        F.col("_n_lower").alias("n_days"), "valid",
    )


def derived_metrics(rollup: DataFrame) -> DataFrame:
    """Ratio metrics derived at read time from exact-compose sums
    (SURVEY.md §7.3: 'role-mix and tool-rate kept as sum-pairs until final
    divide')."""
    return rollup.select(
        "*",
        (F.col("tok_len_sum") / F.col("turn_cnt")).alias("tok_len_mean"),
        (F.col("tool_call_cnt") / F.col("turn_cnt")).alias("tool_call_rate"),
        (F.col("role_user_cnt") / F.col("turn_cnt")).alias("role_user_mix"),
        (F.col("role_assistant_cnt") / F.col("turn_cnt")).alias("role_assistant_mix"),
        (F.col("role_tool_cnt") / F.col("turn_cnt")).alias("role_tool_mix"),
    )
