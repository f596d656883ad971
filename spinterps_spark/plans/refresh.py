"""Incremental continuous-aggregate refresh: merge a turn-delta into the
tier cascade, recomputing ONLY the conversations it touched.

The north rule's continuous aggregates so far had two paths: the batch
pipeline (full recompute, plans/pipeline.py) and the streaming cascade
(stateful, streaming/ingest.py). This pass is the third — the
TimescaleDB-style `refresh_continuous_aggregate`: a batch of late/new turns
arrives, and instead of re-running the pipeline the engine

1. re-aggregates just the affected conversations' rollup rows by MERGING
   partial aggregates — every tier metric is an exact-compose sum/count
   (operators/rollup.py docstring), so `old rows (affected convs) UNION
   delta partials -> re-sum` is bit-identical to a from-scratch rollup of
   the union of all turns, at the cost of the DELTA, not the history;
2. re-fills and re-encodes those conversations' Gorilla chunks (gap fill is
   conversation-local — reference: one interpolation unit per time step
   group, interp/steps.py — so a conv-scoped refill equals the full run);
3. publishes both as REFRESH DELTAS in the snapshot log, read back
   latest-wins per conv_id (plans/generations.py). No base file is
   rewritten: write amplification = O(affected convs), and the next
   retention/compaction pass flattens the delta chain.

Refresh composes with retention: chunks are re-encoded only for buckets at
or after the tier's committed retention horizon (plans/generations.
tier_horizons), so a refresh never resurrects aged-out points — while the
rollup table (the system of record, never retained) keeps full history.

Resumable exactly like the other passes: same (run_id, stage) committed ->
skipped; a crash mid-write redoes only the missing waves (per-wave lineage
rows via plans/checkpoint.run_waved_pass).

100-TB scale: one scan of the delta + a broadcast-semi-joined scan of the
affected convs' rollup rows; the fill/encode fan-out is bounded by the
affected-conv count. A day's late data against a year's history touches
~1/365th of the table and none of the chunk store's base files.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

from spinterps_spark.compress.gorilla import DEFAULT_CHUNK, encode_tier_chunks
from spinterps_spark.operators.rollup import (
    DEFAULT_MIN_CNT, METRIC_COLS, base_rollup, rollup_tier)
from spinterps_spark.plans.checkpoint import CheckpointLog, new_run_id, run_waved_pass
from spinterps_spark.plans.generations import current_rollup, tier_horizons
from spinterps_spark.sources.tableformat import tier_tables


def merge_rollup(old_rows: DataFrame, delta_rows: DataFrame, min_cnt: int) -> DataFrame:
    """Merge two partial base-tier rollups of DISJOINT turn sets.

    Exact because every metric column is a sum/count (a bucket present in
    both sides re-sums; present in one passes through), and validity is a
    pure function of the merged turn_cnt. NOT valid for coarser tiers,
    whose validity counts valid lower buckets — the cascade recomputes
    those from the merged finer tier instead (rollup_tier)."""
    cols = ["conv_id", "bucket_ts", *METRIC_COLS]
    merged = (
        old_rows.select(*cols)
        .unionByName(delta_rows.select(*cols))
        .groupBy("conv_id", "bucket_ts")
        .agg(*[F.sum(c).alias(c) for c in METRIC_COLS])
    )
    return merged.withColumn("valid", F.col("turn_cnt") >= F.lit(min_cnt))


def run_refresh_pass(
    spark,
    new_turns: DataFrame,
    out_dir: str,
    tiers: tuple[str, ...] = ("1m", "1h"),
    fill_metric: str = "tok_len_mean",
    fill_method: str | None = "IDW",
    coords: DataFrame | None = None,
    vg_dim: DataFrame | None = None,
    min_cnt: dict | None = None,
    n_salt: int = 16,
    n_waves: int = 2,
    run_id: str | None = None,
    fill_knobs: dict | None = None,
    one_pass: bool = True,
    drift: DataFrame | None = None,
    drift_cols: list[str] | None = None,
    extra_fill_metrics: dict[str, str] | None = None,
) -> dict:
    """Merge `new_turns` into an existing tier store at `out_dir`.

    extra_fill_metrics must MATCH what the pipeline wrote (same
    {name: rollup-expression} dict): a refresh delta's chunk schema has
    to union with the base generation's, and the re-encoded conversations
    replace ALL their metrics at once (latest-wins is per conv_id).
    Requires a fill_method (the no-fill encode is single-metric).

    `tiers` must be the store's cascade order (finest first, as the
    pipeline wrote it). fill_method=None encodes the merged valid series
    directly (stores written without gap fill); otherwise the affected
    conversations are re-filled with the same conv-local kernel the
    pipeline uses, which makes refresh-then-read bit-identical to a full
    pipeline rerun over the union of all turns (tests/test_refresh.py).

    Returns a metrics dict: affected conv count, per-tier rows merged and
    chunks published, wall time.
    """
    if (drift is None) != (not drift_cols):
        raise ValueError(
            "drift and drift_cols go together (same contract as "
            "run_retention_pipeline): the drift table must hold a row for "
            "every spine bucket of every refreshed tier"
        )
    run_id = run_id or new_run_id()
    t0 = time.time()
    min_cnt = min_cnt or {}
    fill_knobs = dict(fill_knobs or {})
    ckpt = CheckpointLog(spark, os.path.join(out_dir, "ckpt"))
    rfmt = tier_tables(spark, os.path.join(out_dir, "rollup"))
    cfmt = tier_tables(spark, os.path.join(out_dir, "chunks"))
    horizons = tier_horizons(spark, out_dir)

    # validate this refresh's metric set against what the pipeline stamped
    # into its commit rows (settings-as-attributes): latest-wins replaces
    # ALL of a refreshed conv's metrics at once, so a mismatched set would
    # silently thin per-conv metric coverage with no failure anywhere
    mine = json.dumps([fill_metric, *sorted(extra_fill_metrics or {})])
    stamped = [s["fill_metrics"] for s in rfmt.snapshots()
               if s.get("fill_metrics")]
    if stamped and stamped[-1] != mine:
        raise ValueError(
            f"refresh metric set {mine} does not match the store's "
            f"{stamped[-1]} — pass the same fill_metric/extra_fill_metrics "
            "the pipeline used"
        )

    # the affected-conv list is PART of the published metadata: readers
    # resolve latest-wins with it (generations.read_current), so it lives
    # next to the delta under a run-keyed path and is written once.
    convs_loc = os.path.join(out_dir, f"refresh/run={run_id}/convs")
    convs = new_turns.select("conv_id").distinct()
    # resume on evidence of a COMPLETED write, not bare directory
    # existence: a crashed partial write leaves the dir behind, and
    # reusing it would either fail every retry or (committer v2) serve an
    # incomplete conv list — which read_current's anti join would turn
    # into duplicate conv versions. mode('overwrite') replaces any
    # partial remnant. Marker-less committers (marksuccessfuljobs=false)
    # count as complete when part files exist with no in-flight
    # _temporary dir — never rewriting a published list a concurrent
    # reader may be resolving against.
    def _complete(p):
        if os.path.exists(os.path.join(p, "_SUCCESS")):
            return True
        return (
            os.path.isdir(p)
            and not os.path.isdir(os.path.join(p, "_temporary"))
            and any(f.startswith("part-") for f in os.listdir(p))
        )

    if _complete(convs_loc):
        convs = spark.read.parquet(convs_loc)
        n_convs = convs.count()
    else:
        # count BEFORE writing the sidecar: an empty late-data batch must
        # not grow the delta chain (every published delta adds an anti join
        # to every future read), and its convs dir — referenced by no
        # commit, hence invisible to vacuum's refcounting — would leak
        # forever (ADVICE r6 #2)
        n_convs = convs.count()
        if n_convs:
            convs.write.mode("overwrite").parquet(convs_loc)
            convs = spark.read.parquet(convs_loc)
    if n_convs == 0:
        return {"run_id": run_id, "n_affected_convs": 0, "tiers": {},
                "wall_sec": time.time() - t0}

    metrics: dict = {"run_id": run_id, "n_affected_convs": n_convs, "tiers": {}}
    lower_merged: DataFrame | None = None
    for tier in tiers:
        t_tier = time.time()
        mc = min_cnt.get(tier, DEFAULT_MIN_CNT[tier])
        stage = f"refresh:{tier}"
        roll_loc = os.path.join(out_dir, f"rollup_refresh/tier={tier}/gen={run_id}")
        chunk_loc = os.path.join(out_dir, f"chunks_refresh/tier={tier}/gen={run_id}")

        if rfmt.committed(run_id, stage):
            merged = spark.read.parquet(os.path.join(roll_loc, "wave=*"))
        else:
            if lower_merged is None:
                # base tier: merge partial aggregates — history cost is the
                # affected convs' EXISTING rollup rows, not their raw turns
                old = current_rollup(spark, out_dir, tier)
                if old is None:
                    raise ValueError(
                        f"refresh: no committed rollup for tier={tier} under "
                        f"{out_dir} — run the pipeline first"
                    )
                old_aff = old.join(F.broadcast(convs), "conv_id", "semi")
                delta = base_rollup(new_turns, tier, n_salt=n_salt, min_cnt=mc)

                def make(sub, _old=old_aff, _mc=mc):
                    # waves split by conv hash; the merge groups by conv, so
                    # per-wave merge(old_wave, delta_wave) == global merge
                    return merge_rollup(
                        _old.join(
                            F.broadcast(sub.select("conv_id").distinct()),
                            "conv_id", "semi",
                        ),
                        sub, _mc,
                    )

                merged = run_waved_pass(
                    spark, delta, make, roll_loc, ckpt, run_id,
                    f"refresh_rollup:{tier}", n_waves=n_waves, one_pass=one_pass,
                )
            else:
                # coarser tiers recompute from the merged finer tier
                # (validity counts valid lower buckets — not mergeable)
                def make(sub, _tier=tier, _mc=mc):
                    return rollup_tier(sub, _tier, min_cnt=_mc)

                merged = run_waved_pass(
                    spark, lower_merged, make, roll_loc, ckpt, run_id,
                    f"refresh_rollup:{tier}", n_waves=n_waves, one_pass=one_pass,
                )
            rfmt.commit_tier(tier, merged, roll_loc, {
                "run_id": run_id, "stage": stage,
                "convs_location": convs_loc, "n_affected_convs": n_convs,
            })

        if not cfmt.committed(run_id, stage):
            extras = dict(extra_fill_metrics or {})
            if extras and fill_method is None:
                raise ValueError(
                    "extra_fill_metrics requires a fill_method (the "
                    "no-fill encode path is single-metric)"
                )
            from spinterps_spark.plans.pipeline import fused_fill_builder

            project, chunker = fused_fill_builder(
                fill_metric, fill_method, coords, vg_dim, drift,
                drift_cols, fill_knobs, extras,
            )
            ser = project(merged.where(F.col("valid")))
            hz = horizons.get(tier)
            if fill_method is None:
                # no-fill store: refs ARE the content — exact trim at the
                # horizon (never resurrect aged-out points)
                if hz is not None:
                    ser = ser.where(
                        F.unix_timestamp("bucket_ts") >= F.lit(int(hz)))

                def chunk(sub, _tier=tier):
                    return encode_tier_chunks(
                        sub.withColumnRenamed(fill_metric, "value_filled"),
                        _tier,
                    )
            else:
                # filled store: trim AFTER the fill, inside the kernel
                # (grid_min_ts) — pre-horizon refs must keep anchoring the
                # interpolation or filled points just after the horizon
                # vanish vs a full rebuild (code-review r6 finding #1);
                # aged-out grid points are still never emitted. The
                # closure itself is the pipeline's own (fused_fill_builder)
                # so the two call sites cannot drift.
                chunk = chunker(tier, None if hz is None else int(hz))

            chunks = run_waved_pass(
                spark, ser, chunk, chunk_loc, ckpt, run_id,
                f"refresh_chunks:{tier}", n_waves=n_waves, one_pass=one_pass,
            )
            cfmt.commit_tier(tier, chunks, chunk_loc, {
                "run_id": run_id, "stage": stage,
                "convs_location": convs_loc, "n_affected_convs": n_convs,
                "horizon_ts": int(hz) if hz is not None else 0,
                # encode-time bound for THIS delta's rows (the exact setting
                # stamped into every row): lets routed reads derive the
                # pruning span from commit metadata instead of an eager
                # max(chunk_size) scan per leg (ADVICE r6 #5)
                "chunk_size_max": int(
                    fill_knobs.get("gorilla_chunk", DEFAULT_CHUNK)
                    if fill_method is not None else DEFAULT_CHUNK),
            })
            metrics["tiers"][tier] = {
                "commit": "published", "wall_sec": time.time() - t_tier,
            }
        else:
            metrics["tiers"][tier] = {
                "commit": "skipped", "wall_sec": time.time() - t_tier,
            }
        lower_merged = merged

    metrics["wall_sec"] = time.time() - t0
    return metrics
