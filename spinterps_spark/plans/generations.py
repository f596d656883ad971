"""Generation resolution for tier tables: full rewrites + refresh deltas.

Three kinds of commit now appear in a tier table's snapshot log
(sources/tableformat.py):

- FULL generations — the original pipeline publish (stage ``rollup:<tier>``
  / ``chunks:<tier>`` layout dirs) and the maintenance rewrites
  (``retention:<tier>``, ``compaction:<tier>``). Each holds the tier's
  complete content; the latest one supersedes everything before it.
- REFRESH deltas (stage ``refresh:<tier>``, plans/refresh.py) — the
  incremental continuous-aggregate path. A delta holds the COMPLETE new
  rows for the conversations a turn-delta touched (and only those), plus a
  pointer to the affected-conv list it was computed for.

The current view of a tier is therefore Iceberg-style merge-on-read with
conv_id-level equality deletes: base rows for conversations no delta
touched, each delta's rows except where a LATER delta re-touched the same
conversation — latest-wins per conv_id. A subsequent full rewrite
(retention/compaction reads THIS merged view) flattens the delta chain, the
same way table-format compaction resolves delete files.

100-TB scale: resolution is metadata-only (the snapshot log, KBs); the
affected-conv lists are tiny relative to the data (a delta touches the
conversations active since the last refresh) and join as broadcast
anti/semi joins, so the merged read adds no shuffle to the base scan, and
the parquet filters still push below it (EXPLAIN.md asserts PushedFilters
on the merged plan).

Reference anchor: the incremental-write restart unit interp/steps.py:895-949
(completed work is kept, only the missing slice recomputes); the
metadata-travels-with-the-data rule interp/prepare.py:387-428.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, functions as F

from spinterps_spark.sources.tableformat import tier_tables


def generation_plan(fmt, tier: str, default_base: str):
    """Resolve the snapshot log into (base_glob, [refresh-delta snaps]).

    The base is the latest FULL generation's data (or `default_base`, the
    layout dir the pipeline writes, when none was ever published); the
    deltas are the refresh commits SINCE that generation, in commit order.
    """
    base = default_base
    deltas: list[dict] = []
    for s in fmt.snapshots():
        if s.get("tier") != tier:
            continue
        if str(s.get("stage", "")).startswith("refresh:"):
            deltas.append(s)
        else:
            # a full rewrite was computed FROM the merged view, so it
            # already folds every earlier delta
            base = os.path.join(s["data_location"], "wave=*")
            deltas = []
    return base, deltas


def read_current(spark, fmt, tier: str, default_base: str) -> DataFrame | None:
    """The tier's current content: base minus refreshed convs, plus each
    delta latest-wins per conv_id. None when the tier holds nothing."""
    base, deltas = generation_plan(fmt, tier, default_base)
    base_df = spark.read.parquet(base) if _glob.glob(base) else None
    if not deltas:
        return base_df
    # walk the delta chain newest-first, accumulating the conv set that
    # supersedes everything older
    out: DataFrame | None = None
    later: DataFrame | None = None
    for s in reversed(deltas):
        leg = spark.read.parquet(os.path.join(s["data_location"], "wave=*"))
        convs = spark.read.parquet(s["convs_location"]).select("conv_id")
        if later is not None:
            leg = leg.join(F.broadcast(later), "conv_id", "left_anti")
        out = leg if out is None else out.unionByName(leg)
        later = convs if later is None else later.unionByName(convs).distinct()
    if base_df is not None:
        out = out.unionByName(
            base_df.join(F.broadcast(later), "conv_id", "left_anti")
        )
    return out


def current_chunks(spark, out_dir: str, tier: str) -> DataFrame | None:
    """Merged current view of a tier's Gorilla chunk table."""
    fmt = tier_tables(spark, os.path.join(out_dir, "chunks"))
    return read_current(
        spark, fmt, tier, os.path.join(out_dir, f"chunks/tier={tier}", "wave=*")
    )


def current_rollup(spark, out_dir: str, tier: str) -> DataFrame | None:
    """Merged current view of a tier's rollup table (the system of record
    the refresh pass merges new turn-deltas into)."""
    fmt = tier_tables(spark, os.path.join(out_dir, "rollup"))
    return read_current(
        spark, fmt, tier, os.path.join(out_dir, f"rollup/tier={tier}", "wave=*")
    )


def tier_horizons(spark, out_dir: str) -> dict[str, int]:
    """Latest committed retention horizon per tier (epoch seconds).
    Tiers never retained are absent (horizon 0 = holds all history)."""
    fmt = tier_tables(spark, os.path.join(out_dir, "chunks"))
    out: dict[str, int] = {}
    for s in fmt.snapshots():
        t = s.get("tier")
        if t and s.get("stage") == f"retention:{t}":
            out[t] = int(s["horizon_ts"])  # snapshots are append-ordered
    return out
