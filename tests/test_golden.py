"""Golden-parquet integrity: the committed goldens must equal a fresh
regeneration from the independent oracle chain (tools_golden.py), so driver
fixture drift or oracle edits can never silently stale them. ALL committed
golden names are parametrized (an oracle edit that shifts any kernel
query's expected output fails here). Runs at sf0.001 to stay cheap; the
sf0.01 goldens are exercised end-to-end by tests/test_queries_oracle.py
(Spark vs DuckDB read_parquet)."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import tools_golden  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(tools_golden.BUILDERS))
def test_committed_golden_matches_regeneration(name):
    committed = pd.read_parquet(tools_golden.golden_path(name, SF))
    fresh = tools_golden.build_golden(name, SF)[committed.columns.tolist()]
    assert len(committed) == len(fresh)
    for c in committed.columns:
        a = committed[c].to_numpy()
        b = fresh[c].to_numpy()
        if committed[c].dtype.kind == "f":
            ok = (a == b) | (np.isnan(a) & np.isnan(b))
        else:
            ok = a == b
        assert ok.all(), (name, c)


def test_every_kernel_query_has_a_builder():
    from spinterps_spark import queries as Q

    kernel = {
        n for n in Q.queries()
        if n.startswith(("gapfill_ok", "gapfill_edk", "gapfill_ik",
                         "variogram_fit", "variogram_nbest", "vg_cluster"))
    }
    assert kernel <= set(tools_golden.BUILDERS), (
        kernel - set(tools_golden.BUILDERS)
    )
    # and every builder is wired into the oracle gate
    assert set(tools_golden.BUILDERS) <= set(Q.oracle_sql().keys())
