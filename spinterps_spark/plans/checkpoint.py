"""Checkpoint / lineage table: resumable tier passes (north_rule requirement).

Reference precedent: the lock-serialized incremental netCDF writes
(interp/steps.py:879-969) let a crashed run keep its completed chunks; the
graft makes that Spark-native: each tier pass is split into `n_waves`
partition waves by `pmod(xxhash64(conv_id), n_waves)`. After a wave's output
is durably written (parquet directory per wave, Iceberg table in
production), one lineage row per wave is appended to the checkpoint table:

    (run_id, tier, wave, status, rows_in, rows_out, checksum, wall_sec, ts)

Resume = read the checkpoint table, skip waves already 'done' for the same
(run_id, tier). Conversations are hash-assigned to waves, so a resumed run
recomputes only the missing conversations — mid-tier resumability after
executor loss, with per-partition metrics for free.

Scale note: waves trade a little scheduling overhead for bounded blast
radius; at 100 TB each wave is itself thousands of tasks, so wave count
stays small (4-16) and constant, not proportional to data.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, functions as F

CKPT_SCHEMA = (
    "run_id string, tier string, wave int, status string, rows_in long, "
    "rows_out long, checksum long, wall_sec double, ts timestamp"
)


class CheckpointLog:
    def __init__(self, spark, ckpt_dir: str):
        self.spark = spark
        self.dir = ckpt_dir

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(CKPT_SCHEMA).parquet(self.dir)
        except Exception:
            return self.spark.createDataFrame([], CKPT_SCHEMA)

    def done_waves(self, run_id: str, tier: str) -> set[int]:
        df = self.read()
        rows = (
            df.where((F.col("run_id") == run_id) & (F.col("tier") == tier)
                     & (F.col("status") == "done"))
            .select("wave")
            .collect()
        )
        return {r.wave for r in rows}

    def append(self, row: dict):
        pdf = self.spark.createDataFrame(
            [(
                row["run_id"], row["tier"], row["wave"], row["status"],
                row["rows_in"], row["rows_out"], row["checksum"],
                row["wall_sec"],
            )],
            "run_id string, tier string, wave int, status string, rows_in long,"
            " rows_out long, checksum long, wall_sec double",
        ).withColumn("ts", F.current_timestamp())
        pdf.coalesce(1).write.mode("append").parquet(self.dir)


def wave_col(n_waves: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_waves)).cast("int")


def checksum_agg(df: DataFrame, cols: list[str]):
    """Order-insensitive content checksum: sum of xxhash64 over row images.
    Cheap lineage fingerprint comparable between runs."""
    h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    # decimal accumulator: sum of 2^63-scale hashes overflows long under
    # ANSI mode; fold back into long range after the exact decimal sum.
    dec_sum = F.sum(h.cast("decimal(38,0)"))
    return df.agg(
        F.pmod(dec_sum, F.lit(2**62)).cast("long").alias("checksum"),
        F.count(F.lit(1)).alias("cnt"),
    )


def run_waved_pass(
    spark,
    source: DataFrame,
    transform,
    out_dir: str,
    ckpt: CheckpointLog,
    run_id: str,
    tier: str,
    n_waves: int = 4,
    checksum_cols: list[str] | None = None,
) -> DataFrame:
    """Execute `transform(source_subset)` per conversation-hash wave,
    writing each wave's output to out_dir/wave=K and checkpointing it.
    Already-done waves (same run_id+tier) are skipped on resume.
    Returns the unioned output DataFrame (read back from disk)."""
    done = ckpt.done_waves(run_id, tier)
    src = source.withColumn("_wave", wave_col(n_waves))
    for w in range(n_waves):
        if w in done:
            continue
        t0 = time.time()
        sub = src.where(F.col("_wave") == w).drop("_wave")
        out = transform(sub)
        path = os.path.join(out_dir, f"wave={w}")
        out.write.mode("overwrite").parquet(path)
        written = spark.read.parquet(path)
        cols = checksum_cols or [c for c in written.columns]
        stats = checksum_agg(written, cols).first()
        ckpt.append(
            dict(
                run_id=run_id, tier=tier, wave=w, status="done",
                rows_in=sub.count(), rows_out=stats.cnt,
                checksum=stats.checksum if stats.checksum is not None else 0,
                wall_sec=time.time() - t0,
            )
        )
    return spark.read.parquet(os.path.join(out_dir, "wave=*"))


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def summarize(ckpt: CheckpointLog, run_id: str) -> str:
    rows = [r.asDict() for r in ckpt.read().where(F.col("run_id") == run_id).collect()]
    for r in rows:
        r["ts"] = str(r["ts"])
    return json.dumps(rows, default=str)
