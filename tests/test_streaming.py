import os

import pandas as pd

from spinterps_spark import datagen
from spinterps_spark.operators import rollup as R
from spinterps_spark.streaming.ingest import run_stream_to_parquet


def test_streaming_rollup_matches_batch(spark, tmp_path):
    """Streaming 1m tier (availableNow) == batch 1m tier, bit-for-bit.

    Append mode only emits windows the watermark has passed, so feed data
    whose max ts is far beyond every window end (watermark '0 seconds'
    still finalizes all-but-last); we compare on the common set and require
    it to cover all batch rows except possibly the trailing window.
    """
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    t = datagen.transcripts_spark(spark, seed=42, n_turns_target=2000)
    t.write.mode("overwrite").parquet(in_dir)

    run_stream_to_parquet(spark, in_dir, out_dir, ck_dir, watermark="0 seconds")

    got = (
        spark.read.parquet(out_dir).toPandas()
        .sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    )
    batch = (
        R.single_phase_rollup(spark.read.parquet(in_dir), "1m")
        .drop("valid").toPandas()
        .sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    )
    assert len(got) >= len(batch) - 2  # trailing open window(s) may be held
    merged = batch.merge(got, on=["conv_id", "bucket_ts"], suffixes=("_b", "_s"))
    assert len(merged) == len(got)
    for c in ("turn_cnt", "tok_len_sum", "tool_call_cnt",
              "role_user_cnt", "role_assistant_cnt", "role_tool_cnt"):
        assert (merged[f"{c}_b"] == merged[f"{c}_s"]).all(), c

    # resume: running again with the same checkpoint processes nothing new
    run_stream_to_parquet(spark, in_dir, out_dir, ck_dir, watermark="0 seconds")
    again = spark.read.parquet(out_dir).count()
    assert again == len(got)
