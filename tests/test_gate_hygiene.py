"""Gate-query temp hygiene (VERDICT r6 next-step #4): the composite gate
queries write per-invocation scratch under /tmp; every dir is tracked and
removed by cleanup_gate_tmpdirs (registered atexit for the driver run, so
a full 50-query gate leaves /tmp clean)."""

import os

import spinterps_spark.queries as Q


def test_gorilla_gate_tmpdirs_tracked_and_cleaned(spark):
    df = Q.q_gorilla_roundtrip(spark, "/root/testdata/sf0.001")
    assert df.count() > 0  # materialize BEFORE cleanup — reads are lazy
    dirs = list(Q._GATE_TMP_DIRS)
    assert dirs, "composite did not register its scratch dir"
    assert all(os.path.isdir(d) for d in dirs)
    Q.cleanup_gate_tmpdirs()
    assert not Q._GATE_TMP_DIRS
    assert not any(os.path.isdir(d) for d in dirs)
