"""End-to-end retention pipeline: the engine's flagship entry point.

transcripts -> 1m/1h/1d rollups -> spine -> gap-fill -> Gorilla chunks,
each tier pass checkpointed and resumable (plans/checkpoint.py).

This is the Spark translation of SpInterpMain.interpolate()
(SURVEY.md §3.1): the reference's `_interp_args` logical-plan list becomes
the `tiers`/`fill_method` arguments; its memory-planned mp.Pool chunking
becomes AQE + salted repartition + wave checkpoints; its lock-serialized
netCDF writes become per-wave parquet (Iceberg in production) commits.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

from spinterps_spark import TIERS
from spinterps_spark.compress.gorilla import encode_tier_chunks
from spinterps_spark.operators.gapfill import gapfill, gapfill_virtual_chunks
from spinterps_spark.operators.rollup import base_rollup, rollup_tier
from spinterps_spark.operators.spine import with_spine
from spinterps_spark.plans.checkpoint import CheckpointLog, new_run_id, run_waved_pass
from spinterps_spark.sources.tableformat import tier_tables


def fused_fill_builder(fill_metric, fill_method, coords, vg_dim, drift,
                       drift_cols, fill_knobs, extras):
    """The valid-series projection and the fused fill+encode closure,
    shared VERBATIM by run_retention_pipeline and run_refresh_pass — the
    refresh == full-rebuild bit-equality contract depends on the two
    sites never drifting (a knob added to one and not the other breaks it
    silently). Returns (project, chunker): project maps valid rollup rows
    to the fill series; chunker(tier, grid_min_ts) builds the per-wave
    transform (grid_min_ts is the refresh pass's post-fill horizon trim,
    None for the pipeline)."""

    def project(rolled_valid: DataFrame) -> DataFrame:
        return rolled_valid.select(
            "conv_id", "bucket_ts",
            (F.col("tok_len_sum") / F.col("turn_cnt")).alias(fill_metric),
            *[F.expr(x).alias(n) for n, x in extras.items()],
        )

    def chunker(tier: str, grid_min_ts: int | None = None):
        def chunk(sub):
            return gapfill_virtual_chunks(
                sub, fill_metric, method=fill_method, tier=tier,
                coords=coords, vg_dim=vg_dim,
                drift=drift, drift_cols=drift_cols,
                grid_min_ts=grid_min_ts,
                extra_value_cols=list(extras) or None,
                chunk_buckets=fill_knobs.get("chunk_buckets", 3840),
                **{k: v for k, v in fill_knobs.items()
                   if k not in ("chunk_buckets", "pad_buckets")},
            )
        return chunk

    return project, chunker


def run_retention_pipeline(
    spark,
    transcripts: DataFrame,
    out_dir: str,
    tiers: tuple[str, ...] = TIERS,
    fill_metric: str = "tok_len_mean",
    fill_method: str = "IDW",
    coords: DataFrame | None = None,
    vg_dim: DataFrame | None = None,
    n_salt: int = 16,
    n_waves: int = 4,
    run_id: str | None = None,
    min_cnt: dict | None = None,
    gorilla: bool = True,
    fill_knobs: dict | None = None,
    n_turns_hint: int | None = None,
    fuse_fill_and_chunks: bool = False,
    table_format=None,
    iceberg_table: str | None = None,
    drift: DataFrame | None = None,
    drift_cols: list[str] | None = None,
    one_pass: bool = True,
    extra_fill_metrics: dict[str, str] | None = None,
) -> dict:
    """Run (or resume) the full tier cascade. Returns a metrics dict.

    extra_fill_metrics: {metric_name: SQL expression over the rollup
    columns} — fill k metrics through the ONE fused pass (the chunk
    table gains a `metric` column; primary = fill_metric). Requires the
    fused+gorilla path; k metrics cost one scan/shuffle/kernel, with the
    kriging solve shared across them (operators/gapfill.py
    gapfill_virtual_chunks extra_value_cols).

    Layout under out_dir:
        rollup/tier=<t>/wave=<k>/*.parquet   rolled-up buckets
        filled/tier=<t>/wave=<k>/*.parquet   gap-filled series
        chunks/tier=<t>/wave=<k>/*.parquet   Gorilla chunk structs
        rollup/_snapshots.jsonl               tier commits + run settings
        ckpt/*.parquet                        lineage + metrics rows

    Every completed tier rollup is COMMITTED through the TableFormat seam
    (sources/tableformat.py): Iceberg partitioned (tier, days(bucket_ts))
    with run settings in the snapshot summary when the runtime is present,
    parquet + _snapshots.jsonl metadata commits otherwise. Resume first
    consults the snapshot log (whole-tier skip), then the wave checkpoints
    (partial-tier skip)."""
    if (drift is None) != (not drift_cols):
        raise ValueError(
            "drift and drift_cols go together: a drift table without "
            "drift_cols would be silently ignored (EDK would fall back to "
            "the synthetic linear-time drift), and drift_cols without a "
            "table cannot be joined"
        )
    # NOTE r6: external drift now rides the fused virtual-spine path too —
    # gapfill_virtual_chunks chunk-assigns the drift table rows and the
    # kernel looks gap-point covariates up by exact bucket (bit-identical
    # to the materialized with_drift join; VERDICT r5 next-step #4).
    # Coverage contract (same as with_drift): the drift table must hold a
    # row for every spine bucket of every tier being filled — a cascade
    # over ("1m","1h") needs 1m-granular drift; missing buckets fail fast
    # with the kernel's NaN-drift ValueError, never a silent fallback.
    run_id = run_id or new_run_id()
    ckpt = CheckpointLog(spark, os.path.join(out_dir, "ckpt"))
    fmt = table_format or tier_tables(
        spark, os.path.join(out_dir, "rollup"), iceberg_table
    )
    run_props = dict(
        run_id=run_id, n_waves=n_waves, n_salt=n_salt,
        fill_method=fill_method, fill_metric=fill_metric,
        tiers=",".join(tiers), fused=fuse_fill_and_chunks,
        # the store's metric set travels with the data (settings-as-
        # attributes rule): refresh validates its own metric set against
        # this, because latest-wins replaces ALL of a refreshed conv's
        # metrics at once — a mismatched refresh would silently thin
        # per-conv metric coverage
        fill_metrics=json.dumps(
            [fill_metric, *sorted(extra_fill_metrics or {})]),
    )
    min_cnt = min_cnt or {}
    fill_knobs = fill_knobs or {}
    t_start = time.time()
    if extra_fill_metrics and not (fuse_fill_and_chunks and gorilla):
        raise ValueError(
            "extra_fill_metrics requires the fused gorilla path "
            "(fuse_fill_and_chunks=True, gorilla=True)"
        )
    metrics = {"run_id": run_id, "tiers": {}}

    # avoid a dedicated count scan when the caller already knows the volume
    n_turns = n_turns_hint if n_turns_hint is not None else transcripts.count()
    metrics["n_turns"] = n_turns

    lower: DataFrame | None = None
    for tier in tiers:
        t0 = time.time()
        if lower is None:
            def make(sub, _tier=tier):
                return base_rollup(sub, _tier, n_salt=n_salt,
                                   min_cnt=min_cnt.get(_tier))
            src = transcripts
        else:
            def make(sub, _tier=tier):
                return rollup_tier(sub, _tier, min_cnt=min_cnt.get(_tier))
            src = lower

        stage = f"rollup:{tier}"
        tier_loc = os.path.join(out_dir, f"rollup/tier={tier}")
        if fmt.committed(run_id, stage):
            # snapshot-summary resume: the whole tier was published
            rolled = spark.read.parquet(os.path.join(tier_loc, "wave=*"))
        else:
            rolled = run_waved_pass(
                spark, src, make, tier_loc,
                ckpt, run_id, stage, n_waves=n_waves, one_pass=one_pass,
            )
            fmt.commit_tier(tier, rolled, tier_loc,
                            {**run_props, "stage": stage})

        if fuse_fill_and_chunks and gorilla:
            # one grouped pass over the VIRTUAL spine: gap grid points are
            # generated inside the kernel from conversation bounds, so the
            # ~30x NULL-row spine inflation never hits the shuffle or the
            # Arrow boundary; output is the Gorilla chunk table directly.
            project, chunker = fused_fill_builder(
                fill_metric, fill_method, coords, vg_dim, drift,
                drift_cols, fill_knobs, dict(extra_fill_metrics or {}),
            )
            valid_ser = project(rolled.where(F.col("valid")))
            fill_chunk = chunker(tier)

            run_waved_pass(
                spark, valid_ser, fill_chunk,
                os.path.join(out_dir, f"chunks/tier={tier}"),
                ckpt, run_id, f"chunks:{tier}", n_waves=n_waves, one_pass=one_pass,
            )
        else:
            spined = with_spine(rolled, tier)
            ser = spined.select(
                "conv_id", "bucket_ts",
                (F.col("tok_len_sum") / F.col("turn_cnt")).alias(fill_metric),
            )
            if drift is not None:
                from spinterps_spark.operators.gapfill import with_drift

                ser = with_drift(ser, drift, drift_cols or [])

            def fill(sub, _tier=tier):
                return gapfill(
                    sub, fill_metric, method=fill_method, tier=_tier,
                    coords=coords, vg_dim=vg_dim,
                    drift_cols=drift_cols if drift is not None else None,
                    **fill_knobs,
                )

            filled = run_waved_pass(
                spark, ser, fill, os.path.join(out_dir, f"filled/tier={tier}"),
                ckpt, run_id, f"filled:{tier}", n_waves=n_waves, one_pass=one_pass,
            )

            if gorilla:
                def chunk(sub, _tier=tier):
                    return encode_tier_chunks(
                        sub.where(F.col("value_filled").isNotNull()), _tier
                    )

                run_waved_pass(
                    spark, filled, chunk, os.path.join(out_dir, f"chunks/tier={tier}"),
                    ckpt, run_id, f"chunks:{tier}", n_waves=n_waves, one_pass=one_pass,
                )

        metrics["tiers"][tier] = {"wall_sec": time.time() - t0}
        lower = rolled

    metrics["wall_sec"] = time.time() - t_start
    metrics["points_per_sec"] = n_turns / metrics["wall_sec"]
    return metrics
