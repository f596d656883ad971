"""Streaming ingestion: transcripts stream -> 1m-tier continuous aggregates.

The reference is strictly batch (SURVEY.md §2.10); the engine adds the
Spark-native continuous path: `readStream` over arriving transcript files
(Kafka in production — same query shape), watermarked event-time windows for
the base tier, append-mode parquet sink. Late turns beyond the watermark are
handled the batch way: re-running the affected tier partitions is cheap via
the checkpoint/lineage table (plans/checkpoint.py), mirroring the
reference's restartable incremental writes (interp/steps.py:895-949).

The aggregation is the same exact-compose metric set as
operators/rollup.py, so a streaming 1m tier and a batch 1m tier over the
same data agree bit-for-bit (tested with trigger=availableNow).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from spinterps_spark import TIER_SECONDS
from spinterps_spark.datagen import TRANSCRIPT_SCHEMA

GAP_EVENT_SCHEMA = (
    "conv_id string, gap_start timestamp, gap_end timestamp, n_missing long"
)


def stream_gap_events(
    spark,
    input_dir: str,
    tier: str = "1m",
    min_gap_buckets: int = 3,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): per
    conversation, track the last observed tier bucket across micro-batches
    and emit a gap event whenever new data arrives >= min_gap_buckets after
    it — the streaming twin of the batch spine's gap detection (J2/W3),
    feeding the same gap-fill machinery incrementally.

    State: one long (last bucket index) per conv_id. Gaps inside a single
    micro-batch are detected by the same walk, so event output is
    independent of how turns were chopped into batches.
    """
    secs = TIER_SECONDS[tier]
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    buck = src.withWatermark("ts", watermark).select(
        "conv_id", (F.unix_timestamp("ts") / secs).cast("long").alias("b")
    )

    def track(key, pdfs, state):
        conv = key[0]
        last = state.get[0] if state.exists else None
        bs = sorted({int(x) for pdf in pdfs for x in pdf["b"]})
        events = []
        for b in bs:
            if last is not None and b - last - 1 >= min_gap_buckets:
                events.append(
                    (conv,
                     pd.Timestamp((last + 1) * secs, unit="s"),
                     pd.Timestamp((b - 1) * secs, unit="s"),
                     b - last - 1)
                )
            if last is None or b > last:
                last = b
        if last is not None:
            state.update((int(last),))
        if events:
            yield pd.DataFrame(
                events,
                columns=["conv_id", "gap_start", "gap_end", "n_missing"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return buck.groupBy("conv_id").applyInPandasWithState(
        track,
        outputStructType=GAP_EVENT_SCHEMA,
        stateStructType="last_b long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_base_rollup(
    spark,
    input_dir: str,
    watermark: str = "2 hours",
    tier_window: str = "1 minute",
) -> DataFrame:
    """readStream(files) -> watermarked per-(conv, 1m-window) aggregates."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", tier_window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_cnt"),
            F.sum(F.size(F.split("text", " ")).cast("long")).alias("tok_len_sum"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("tool_call_cnt"),
            F.sum((F.col("role") == "user").cast("long")).alias("role_user_cnt"),
            F.sum((F.col("role") == "assistant").cast("long")).alias("role_assistant_cnt"),
            F.sum((F.col("role") == "tool").cast("long")).alias("role_tool_cnt"),
        )
        .select(
            "conv_id", F.col("w.start").alias("bucket_ts"),
            "turn_cnt", "tok_len_sum", "tool_call_cnt",
            "role_user_cnt", "role_assistant_cnt", "role_tool_cnt",
        )
    )
    return agg


ASOF_FILL_SCHEMA = (
    "conv_id string, bucket_ts timestamp, v_filled double, dist_sec long"
)


def stream_asof_fill(
    spark,
    input_dir: str,
    tier: str = "1h",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """INCREMENTAL nearest-neighbor as-of gap-fill — the streaming twin of
    operators/spine.nearest_asof_fill (J7), closing the loop between the
    streaming gap monitor and the interpolation core: input is a stream of
    rollup rows (conv_id, bucket_ts, v); per-conversation state holds the
    last observed (bucket, value); when the next observation arrives, the
    interior gap buckets between them are emitted with the value of the
    temporally NEARER endpoint, ties to the earlier row — bit-for-bit the
    batch operator's semantics for every closed gap (a gap still open at
    stream end has no right endpoint yet, exactly like a batch spine that
    ends at the last observation).

    State: 16 bytes per conversation (last bucket epoch + value),
    independent of history length. Rows are sorted per micro-batch;
    ACROSS micro-batches the input must arrive in bucket order per
    conversation (the tier writer's commit order provides this; a
    watermark bounds lateness but does NOT order rows — review r4). A
    violating row — older than buckets already used as fill endpoints —
    RAISES rather than silently emitting fills that diverge from the
    batch operator; a duplicate redelivery of the current last bucket is
    skipped idempotently.
    """
    secs = TIER_SECONDS[tier]
    src = (
        spark.readStream.schema("conv_id string, bucket_ts timestamp, v double")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    rows = src.withWatermark("bucket_ts", watermark).select(
        "conv_id", F.unix_timestamp("bucket_ts").alias("t"), "v"
    )

    def fill(key, pdfs, state):
        conv = key[0]
        last_t, last_v = state.get if state.exists else (None, None)
        pts = sorted(
            (int(t), float(v))
            for pdf in pdfs
            for t, v in zip(pdf["t"], pdf["v"])
        )
        out = []
        for t, v in pts:
            if last_t is not None and t == last_t:
                # NaN-safe: a redelivered NaN point is idempotent too
                # (NaN != NaN would otherwise raise on the exact replay
                # the continue below exists for)
                if v != last_v and not (v != v and last_v != last_v):
                    raise ValueError(
                        f"stream_asof_fill: conflicting redelivery for "
                        f"{conv!r} at t={t} (state holds v={last_v}, got "
                        f"v={v}) — silently keeping either would let the "
                        "stream diverge from the batch operator"
                    )
                continue  # idempotent redelivery of the current endpoint
            if last_t is not None and t < last_t:
                raise ValueError(
                    f"stream_asof_fill: out-of-order bucket for {conv!r} "
                    f"(got {t}, already filled up to {last_t}) — emitted "
                    "fills would diverge from the batch operator"
                )
            if last_t is not None and t - last_t > secs:
                for g in range(last_t + secs, t, secs):
                    d_prev = g - last_t
                    d_next = t - g
                    take_prev = d_prev <= d_next  # tie -> earlier row
                    out.append(
                        (conv, pd.Timestamp(g, unit="s"),
                         last_v if take_prev else v,
                         d_prev if take_prev else d_next)
                    )
            last_t, last_v = t, v
        if last_t is not None:
            state.update((int(last_t), float(last_v)))
        if out:
            yield pd.DataFrame(
                out, columns=["conv_id", "bucket_ts", "v_filled", "dist_sec"]
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return rows.groupBy("conv_id").applyInPandasWithState(
        fill,
        outputStructType=ASOF_FILL_SCHEMA,
        stateStructType="last_t long, last_v double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_tier_cascade(
    spark,
    input_dir: str,
    watermark: str = "2 hours",
    min_cnt: int = 1,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """CHAINED streaming windowed aggregation: transcripts -> 1m windows ->
    1h windows in ONE streaming query (Spark 3.4+ multiple-stateful-
    operator support: the second groupBy windows over window_time() of the
    first, so both aggs are event-time stateful ops in the same plan).

    Metric composition is rollup_tier's exactly: 1h sums compose the 1m
    sums, validity = count of contributing 1m windows >= min_cnt, invalid
    buckets keep the row with NULL metrics (the gap stays visible to the
    gap-filler). A streaming cascade and the batch
    rollup_tier(base_rollup(t, '1m'), '1h') over the same files agree
    bit-for-bit (tested with trigger=availableNow).

    100 TB shape: both aggregation states are watermark-bounded; the 1h
    state holds partial sums per (conv, hour) only inside the watermark
    horizon, so state size tracks active conversations, not history.
    """
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    m1 = (
        src.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("turn_cnt"),
            F.sum(F.size(F.split("text", " ")).cast("long")).alias("tok_len_sum"),
            F.sum(F.col("tool").isNotNull().cast("long")).alias("tool_call_cnt"),
            F.sum((F.col("role") == "user").cast("long")).alias("role_user_cnt"),
            F.sum((F.col("role") == "assistant").cast("long")).alias("role_assistant_cnt"),
            F.sum((F.col("role") == "tool").cast("long")).alias("role_tool_cnt"),
        )
    )
    metric_cols = [
        "turn_cnt", "tok_len_sum", "tool_call_cnt",
        "role_user_cnt", "role_assistant_cnt", "role_tool_cnt",
    ]
    h1 = (
        m1.groupBy(
            "conv_id", F.window(F.window_time("w"), "1 hour").alias("wh")
        )
        .agg(
            *[F.sum(c).alias(c) for c in metric_cols],
            F.count(F.lit(1)).alias("_n_lower"),
        )
        .withColumn("valid", F.col("_n_lower") >= F.lit(min_cnt))
    )
    return h1.select(
        "conv_id",
        F.col("wh.start").alias("bucket_ts"),
        *[
            F.when(F.col("valid"), F.col(c)).otherwise(F.lit(None)).alias(c)
            for c in metric_cols
        ],
        "valid",
    )


def run_stream_to_parquet(
    spark, input_dir: str, out_dir: str, checkpoint_dir: str,
    available_now: bool = True, watermark: str = "2 hours",
):
    """Start (and for available_now=True, run to completion) the streaming
    1m rollup into an append-mode parquet sink."""
    agg = stream_base_rollup(spark, input_dir, watermark=watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_dedup_turns(
    spark,
    input_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming EXACT dedup of arriving turns (the streaming twin of
    dedup.exact_dedup): duplicate (conv_id, turn_idx, text) deliveries —
    e.g. at-least-once upstream replays — are dropped with
    dropDuplicatesWithinWatermark, so dedup state is BOUNDED by the
    watermark horizon instead of growing forever like a plain
    dropDuplicates over an unbounded stream would.

    Emits one row per first-seen turn with its content hash. The dedup key
    is (conv_id, turn_idx, xxhash64(text), length(text)) — hashing BEFORE
    the stateful op, like the batch twin keys on md5(text) — so each
    state-store entry is fixed-width regardless of turn length; at 100 TB
    the state store holds only the watermark window's fixed-size keys per
    partition, and the same-key lookup is a state-store point read — no
    shuffle beyond the hash partitioning Structured Streaming already
    does for stateful ops. length(text) rides in the key because a bare
    64-bit hash can collide between two DIFFERENT texts at the same
    (conv_id, turn_idx) inside the watermark window, silently dropping a
    genuinely new turn (ADVICE r3) — hash+length keeps the entry
    fixed-width while pushing the collision odds to hash AND length both
    matching. NOTE (upgrade): adding text_len changed the stateful
    operator's dedup-key schema — a checkpoint written by the pre-r4
    3-column key cannot be resumed (standard Structured Streaming rule:
    stateful-op key changes require a fresh checkpoint directory).
    """
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        src.select(
            "conv_id", "turn_idx", "ts",
            F.xxhash64("text").alias("text_hash"),
            F.length("text").alias("text_len"),
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(
            ["conv_id", "turn_idx", "text_hash", "text_len"]
        )
    )


DOC_STREAM_SCHEMA = "doc_id long, text string, ingest_ts timestamp"


def stream_curation(
    spark,
    input_dir: str,
    watermark: str = "2 hours",
    min_tokens: int = 10,
    min_quality: float = 0.5,
    langs: list[str] | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming twin of the corpus pipeline's doc-local stage
    (plans/corpus.py): documents arriving continuously are exact-deduped
    within a watermark horizon, then quality-scored, language-ID'd,
    PII-counted and REDACTED — the near-real-time curation feed a training
    pipeline tails instead of re-running the batch pass.

    Shape: one stateful op (dropDuplicatesWithinWatermark on a fixed-width
    (text_hash, text_len) key — the stream_dedup_turns state-bounding
    trick) followed by PURE projections (curation_cols: regex/array
    algebra, JVM-side, stateless), so state is bounded by the watermark
    window and everything downstream of the dedup is embarrassingly
    parallel. availableNow over a static directory equals the batch
    projection bit-for-bit on first-seen docs (pytest).

    Keeps the FIRST delivery of each distinct text in the window (batch
    keep-one keeps the min doc_id; a stream can only keep the first seen —
    the watermark is the horizon within which the two agree for
    at-least-once redelivery, the case this operator exists for)."""
    from spinterps_spark.plans.corpus import curation_cols

    src = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    deduped = (
        src.withColumn("text_hash", F.xxhash64("text"))
        .withColumn("text_len", F.length("text"))
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash", "text_len"])
        .drop("text_hash", "text_len")
    )
    out = deduped.select("doc_id", "ingest_ts", *curation_cols()).where(
        (F.col("quality_score") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )
    if langs:
        out = out.where(F.col("lang").isin(*langs))
    return out


def stream_refresh(
    spark,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    tiers: tuple[str, ...] = ("1m",),
    fill_method: str | None = "IDW",
    coords: DataFrame | None = None,
    vg_dim: DataFrame | None = None,
    n_waves: int = 2,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    run_prefix: str = "sr",
):
    """Continuous incremental refresh: the TimescaleDB continuous-aggregate
    policy loop as ONE streaming query. Each micro-batch of newly-arrived
    turns is merged into an existing tier store by
    plans/refresh.run_refresh_pass (affected-conversation recompute only,
    latest-wins delta publish), with the refresh run_id keyed by the
    checkpointed batch_id.

    Exactly-once across crash/restart by COMPOSING two commit logs, with
    no new machinery: Structured Streaming's checkpoint pins each
    batch_id to the same input files on redelivery, and the refresh
    pass's snapshot-commit resume (same run_id+stage already committed ->
    zero jobs) makes a redelivered batch a no-op — so a crash at any
    point (mid-wave, between the rollup and chunk commits, after publish)
    converges without ever double-merging a turn's partial aggregates.
    This is exactly why the refresh contract demands NEW turns only: the
    stream's at-least-once redelivery is absorbed by the run_id, not by
    re-examining the data.

    The store must be bootstrapped by run_retention_pipeline first (the
    refresh pass raises on a tier with no committed rollup). Pair with a
    periodic run_flatten_pass + run_vacuum_pass (plans/vacuum.py) to
    bound the delta chain the stream accretes.
    """
    from spinterps_spark.plans.refresh import run_refresh_pass

    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _merge(batch_df, batch_id):
        # the pass scans the batch several times (conv list, per-tier
        # merges); pin it so the file-source plan isn't re-resolved per
        # action
        batch_df.persist()
        try:
            run_refresh_pass(
                batch_df.sparkSession, batch_df, store_dir, tiers=tiers,
                fill_method=fill_method, coords=coords, vg_dim=vg_dim,
                n_waves=n_waves, run_id=f"{run_prefix}-{batch_id}",
            )
        finally:
            batch_df.unpersist()

    writer = (
        src.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
