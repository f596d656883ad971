"""SK (K2), EDK (K3), IK (K4) parity vs the independent oracle."""

import numpy as np
import pytest

from spinterps_spark.operators import gapfill as G

from tests import oracle


def _series(seed=0, n=200, frac_gap=0.3):
    rng = np.random.RandomState(seed)
    t = np.cumsum(rng.randint(1, 4, n)).astype(np.int64) * 3600
    v = 5.0 + np.sin(t / 50000.0) * 3 + rng.uniform(-0.5, 0.5, n)
    gaps = rng.rand(n) < frac_gap
    v[gaps] = np.nan
    return t, v


@pytest.mark.parametrize("method", ["SK", "EDK", "IK", "OK"])
def test_variant_matches_oracle(method):
    t, v = _series()
    vg = "2.5 Exp(43200.0)"
    kw = dict(ik_lim=5.0) if method == "IK" else {}
    got, gv, gc = G.fill_series(t, v, method=method, vg_str=vg, round_p=6, **kw)
    refs = ~np.isnan(v)
    for j in np.flatnonzero(np.isnan(v)):
        est, ev, code = oracle.fill_one(
            t[j], t[refs], v[refs], method, vg_str=vg, ik_lim=5.0
        )
        want = np.round(est, 6)
        assert got[j] == want, (method, j, got[j], want)
        assert gc[j] == code
        assert np.isclose(gv[j], ev, rtol=0, atol=0), (method, j, gv[j], ev)


def test_ik_values_bounded():
    t, v = _series(seed=3)
    got, ev, codes = G.fill_series(
        t, v, method="IK", vg_str="1.0 Sph(86400.0)", ik_lim=5.0, round_p=None
    )
    filled = codes == "ok"
    assert filled.any()
    # reference clamps only the lower bound (cyth/interpmthds.pyx:740):
    # lambda overshoot can push ik slightly above 1; est_var = max(0, ik(1-ik))
    assert (got[filled] >= 0).all()
    assert (ev[filled] >= 0).all() and (ev[filled] <= 0.25 + 1e-12).all()


def test_edk_recovers_linear_trend():
    # a pure linear trend in time: EDK's drift term should track it closely
    t = np.arange(100, dtype=np.int64) * 3600
    v = 2.0 + (t / 86400.0) * 4.0
    v_gapped = v.copy()
    v_gapped[30:40] = np.nan
    got, _, codes = G.fill_series(
        t, v_gapped, method="EDK", vg_str="1.0 Exp(43200.0)", round_p=None
    )
    assert (codes[30:40] == "ok").all()
    assert np.allclose(got[30:40], v[30:40], rtol=1e-6)


def test_edk_multi_drift_matches_oracle():
    """K3 multi-drift (reference pyx:588-719): TWO external drift columns,
    kernel vs independent oracle, bit-exact."""
    t, v = _series(seed=5)
    rng = np.random.RandomState(12)
    drifts = np.column_stack(
        [t / 86400.0, np.cos(t / 40000.0) + rng.uniform(-0.05, 0.05, len(t))]
    )
    vg = "2.5 Exp(43200.0)"
    got, gv, gc = G.fill_series(
        t, v, method="EDK", vg_str=vg, round_p=6, drifts=drifts
    )
    refs = ~np.isnan(v)
    n_ok = 0
    for j in np.flatnonzero(np.isnan(v)):
        est, ev, code = oracle.fill_one(
            t[j], t[refs], v[refs], "EDK", vg_str=vg,
            drift_ref=drifts[refs], drift_tgt=drifts[j],
        )
        assert got[j] == np.round(est, 6), (j, got[j], est)
        assert gc[j] == code
        n_ok += code == "ok"
    assert n_ok > 10


def test_edk_multi_drift_recovers_plane():
    """Values = exact linear combo of 2 drifts -> EDK reproduces them."""
    t = np.arange(120, dtype=np.int64) * 3600
    d1 = t / 86400.0
    d2 = np.sin(t / 30000.0)
    v = 1.5 + 2.0 * d1 - 3.0 * d2
    v_gapped = v.copy()
    v_gapped[50:60] = np.nan
    got, _, codes = G.fill_series(
        t, v_gapped, method="EDK", vg_str="1.0 Exp(43200.0)",
        round_p=None, drifts=np.column_stack([d1, d2]),
    )
    assert (codes[50:60] == "ok").all()
    assert np.allclose(got[50:60], v[50:60], rtol=1e-6)


def test_edk_default_single_drift_unchanged():
    """drifts=None must reproduce the r1 synthetic linear-time drift path
    bit-for-bit (regression guard for the multi-drift refactor)."""
    t, v = _series(seed=2)
    vg = "2.5 Exp(43200.0)"
    a, _, ca = G.fill_series(t, v, method="EDK", vg_str=vg, round_p=None)
    t0 = t[~np.isnan(v)].min()
    b, _, cb = G.fill_series(
        t, v, method="EDK", vg_str=vg, round_p=None,
        drifts=((t - t0) / 86400.0)[:, None],
    )
    assert (ca == cb).all()
    nn = ~np.isnan(a)
    assert (a[nn] == b[nn]).all()


def test_edk_drift_cols_through_spark(spark):
    """End-to-end: with_drift join + gapfill(drift_cols=...) through the
    Arrow path equals the kernel run directly."""
    import pandas as pd
    from pyspark.sql import functions as F

    t, v = _series(seed=7, n=150)
    drifts = np.column_stack([t / 86400.0, np.cos(t / 40000.0)])
    base = pd.DataFrame(
        {"conv_id": "c1", "bucket_ts": pd.to_datetime(t, unit="s"), "v": v}
    )
    drift_pdf = pd.DataFrame(
        {
            "conv_id": "c1",
            "bucket_ts": pd.to_datetime(t, unit="s"),
            "d1": drifts[:, 0],
            "d2": drifts[:, 1],
        }
    )
    sp = spark.createDataFrame(base)
    dr = spark.createDataFrame(drift_pdf)
    spined = G.with_drift(sp, dr, ["d1", "d2"])
    coords = spark.createDataFrame([("c1", 0)], "conv_id string, cluster_id int")
    vg_dim = spark.createDataFrame(
        [(0, "2.5 Exp(43200.0)")], "cluster_id int, vg_str string"
    )
    out = (
        G.gapfill(spined, "v", method="EDK", coords=coords, vg_dim=vg_dim,
                  drift_cols=["d1", "d2"], round_p=6)
        .orderBy("bucket_ts").toPandas()
    )
    want, _, wc = G.fill_series(
        t, v, method="EDK", vg_str="2.5 Exp(43200.0)", round_p=6, drifts=drifts
    )
    nn = ~np.isnan(want)
    assert (out["value_filled"].to_numpy()[nn] == want[nn]).all()
    assert (out["fill_method"].to_numpy() == wc).all()


def test_pinv_cache_bit_exact_and_reused_across_series():
    """Cross-conversation O2: the shared pinv cache must change nothing in
    the output (pinv is deterministic), and a second series with the same
    relative neighbor patterns must add zero new factorizations."""
    t, v = _series(seed=11)
    vg = "2.5 Exp(43200.0)"
    base, bev, bc = G.fill_series(t, v, method="OK", vg_str=vg, round_p=None)
    cache = {}
    got, gev, gc = G.fill_series(
        t, v, method="OK", vg_str=vg, round_p=None, pinv_cache=cache
    )
    nn = ~np.isnan(base)
    assert (got[nn] == base[nn]).all()
    assert (gev == bev).all() and (gc == bc).all()
    assert len(cache) > 0

    n_before = len(cache)
    got2, _, _ = G.fill_series(
        t + 86400 * 365, v, method="OK", vg_str=vg, round_p=None,
        pinv_cache=cache,
    )
    assert len(cache) == n_before  # every pattern was already cached
    assert (got2[nn] == base[nn]).all()


def test_sk_exact_at_duplicate_distance_zero():
    # SK with a target collocated with a ref: covariance rhs hits C0 and the
    # estimate should be close to the neighboring structure (smoke property)
    t, v = _series(seed=9)
    got, _, codes = G.fill_series(t, v, method="SK", vg_str="2.0 Sph(86400.0)")
    assert (codes != "observed").sum() > 0
