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

from pyspark.sql import DataFrame, functions as F

from spinterps_spark.datagen import TRANSCRIPT_SCHEMA


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
