"""Model-based lifecycle fuzz: random interleavings of the maintenance
passes must never change what a reader sees.

The model is deliberately exact: refresh is the ONLY content-changing op
(it advances the store to the next ground-truth prefix union); compaction,
flatten (either table) and vacuum are content-preserving by contract. So
after EVERY op the decoded current view must equal the full-pipeline
recompute over exactly the turn slices ingested so far — bit-for-bit.
Retention is excluded here (its horizon interacts with refresh trimming
and has its own targeted suites, tests/test_retention.py +
tests/test_refresh.py::test_refresh_after_retention_respects_horizon).

This is the interaction net the targeted tests can't weave: refresh on a
vacuumed store, compaction of a flattened generation, vacuum between two
refreshes, double flatten — whatever the seed draws.
"""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spinterps_spark import datagen
from spinterps_spark.compress.gorilla import decode_tier_chunks
from spinterps_spark.plans.compaction import run_compaction_pass
from spinterps_spark.plans.pipeline import run_retention_pipeline
from spinterps_spark.plans.refresh import run_refresh_pass
from spinterps_spark.plans.retention import read_tier_chunks
from spinterps_spark.plans.vacuum import run_flatten_pass, run_vacuum_pass

TIER = "1m"


def _pts(spark, d):
    return (
        decode_tier_chunks(read_tier_chunks(spark, d, TIER))
        .select("conv_id", "bucket_ts", "value")
        .toPandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("seed", [101, 202])
def test_random_maintenance_interleavings_preserve_the_view(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    t = datagen.transcripts_spark(spark, seed=17, n_turns_target=1800)
    bounds = t.agg(F.min(F.unix_timestamp("ts")).alias("mn"),
                   F.max(F.unix_timestamp("ts")).alias("mx")).first()
    cut = ((bounds.mn + (bounds.mx - bounds.mn) // 2) // 3600) * 3600
    h = F.substring(F.md5("conv_id"), 1, 1)
    e = F.unix_timestamp("ts")
    preds = [(h >= "c") & (e >= cut), h.between("8", "b") & (e >= cut)]
    rest = t.where(~(preds[0] | preds[1]))
    unions = [rest]
    for p in preds:
        unions.append(unions[-1].unionByName(t.where(p)))

    # ground truths: one full pipeline per ingestion prefix
    gt_pts = []
    for i, src in enumerate(unions):
        gdir = str(tmp_path / f"gt{i}")
        run_retention_pipeline(spark, src, gdir, tiers=(TIER,), n_waves=2,
                               gorilla=True, fuse_fill_and_chunks=True,
                               run_id="gt")
        gt_pts.append(_pts(spark, gdir))

    d = str(tmp_path / "store")
    run_retention_pipeline(spark, rest, d, tiers=(TIER,), n_waves=2,
                           gorilla=True, fuse_fill_and_chunks=True,
                           run_id="boot")
    ingested, step, trace = 0, 0, []
    ops = ["refresh", "compact", "flatten_rollup", "flatten_chunks", "vacuum"]
    while step < 8:
        op = rng.choice(ops)
        if op == "refresh":
            if ingested >= len(preds):
                continue
            run_refresh_pass(spark, t.where(preds[ingested]), d,
                             tiers=(TIER,), n_waves=2,
                             run_id=f"r{step}")
            ingested += 1
        elif op == "compact":
            run_compaction_pass(spark, d, TIER, target_file_mb=1,
                                run_id=f"c{step}")
        elif op == "flatten_rollup":
            run_flatten_pass(spark, d, TIER, table="rollup",
                             run_id=f"fr{step}", n_waves=2)
        elif op == "flatten_chunks":
            run_flatten_pass(spark, d, TIER, table="chunks",
                             run_id=f"fc{step}", n_waves=2)
        else:
            run_vacuum_pass(spark, d, keep_last=rng.choice((1, 2)),
                            run_id=f"v{step}")
        trace.append(op)
        step += 1
        pd.testing.assert_frame_equal(
            _pts(spark, d), gt_pts[ingested], check_exact=True,
            obj=f"after {trace}",
        )
