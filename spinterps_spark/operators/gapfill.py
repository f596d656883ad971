"""Gap-fill of empty buckets by weighted temporal interpolation.

Graft of the reference's per-step spatial interpolation (SURVEY.md §3.1) onto
the time axis: for every invalid/absent bucket of a conversation's metric
series, estimate the value from the k nearest *valid* buckets of the same
conversation, weighted by IDW / Ordinary-Kriging / nearest-neighbor over
temporal distance (seconds). Kriging weights come from a variogram model
string fitted per conversation cluster (operators/variogram.py), reusing the
reference's exact DSL and kernels:

- IDW: distances max-normalized to avoid overflow, weights 1/d^p
  (interp/steps.py:297-305, cyth/interpmthds.pyx:784-808).
- OK: (k+1)^2 gamma matrix with Lagrange border, pinv, lambda = A^-1 rhs;
  if sum(lambda) not ~ 1 -> nearest-neighbor fallback with est_var 0
  (cyth/interpmthds.pyx:251-362, fallback interp/steps.py:403-435).
- single-ref short-circuit: one valid bucket -> its value
  (interp/steps.py:281-283).
- low-signal rule P6: all neighbor values < min_var_val_thresh -> neighbor
  mean (interp/steps.py:760-765 applied at 308-330).
- full-nuggetness rule P7: degenerate variogram -> neighbor mean, est_var 0
  (misc.py:1074-1105, used interp/steps.py:722-724).
- value clamp P4 (interp/steps.py:466-476) and round(p) pre-write
  (interp/steps.py:917-918).

Execution model: one `applyInPandas` group per (conv_id[, chunk]) — Arrow
batches, float64 numpy inside, zero per-row Python. The O2 rewrite from the
reference (one matrix factorization per variogram/config, not per step:
interp/prepare.py:465-508, interp/steps.py:333-346) appears here as a pinv
cache keyed by the neighbor index-set, so a contiguous gap run costs one
factorization.

Scale: mega-conversations are split into bounded bucket-range chunks with an
overlap pad of ref rows (the reference's max_steps_per_chunk memory planning,
interp/main.py:723-731), so no single Arrow group exceeds
~chunk_buckets rows regardless of conversation size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from spinterps_spark import TIER_SECONDS
from spinterps_spark.functions.vg_models import check_full_nuggetness, vg_vals

DEFAULTS = dict(
    idw_exp=5.0,          # reference canonical knob (test/test_interp.py:98)
    n_neighbors=8,
    min_var_val_thresh=0.1,  # test/test_interp.py:96
    min_vg_val=1e-4,         # test/test_interp.py:104
    round_p=2,               # nmrl_prcn (FIXTURES.md F6)
)

# fill_method codes emitted per filled bucket (K5 problem-step logging analog)
M_OBSERVED, M_SINGLE, M_LOWSIG, M_NUGGET, M_IDW, M_OK, M_NNB_FALLBACK, M_NNB, M_EMPTY = (
    "observed", "single_ref", "low_signal_mean", "nugget_mean", "idw", "ok",
    "nnb_fallback", "nnb", "unfillable",
)


def fill_series(
    t: np.ndarray,
    v: np.ndarray,
    method: str = "IDW",
    vg_str: str | None = None,
    idw_exp: float = DEFAULTS["idw_exp"],
    n_neighbors: int = DEFAULTS["n_neighbors"],
    min_var_val_thresh: float = DEFAULTS["min_var_val_thresh"],
    min_vg_val: float = DEFAULTS["min_vg_val"],
    min_cut: float | None = None,
    max_cut: float | None = None,
    round_p: int | None = DEFAULTS["round_p"],
):
    """Fill NaNs of v (float64) at times t (int64 seconds, sorted asc).

    Returns (filled_values, est_vars, method_codes). Pure numpy — shared by
    the Spark UDF; the test oracle is an independent reimplementation.
    """
    t = np.asarray(t, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    n = len(t)
    out = v.copy()
    est_var = np.zeros(n, dtype=np.float64)
    codes = np.array([M_OBSERVED] * n, dtype=object)

    miss = np.isnan(v)
    if not miss.any():
        return out, est_var, codes
    ref_idx = np.flatnonzero(~miss)
    gap_idx = np.flatnonzero(miss)
    if len(ref_idx) == 0:
        codes[gap_idx] = M_EMPTY
        return out, est_var, codes

    t_ref = t[ref_idx]
    v_ref = v[ref_idx]
    if method == "OK" and (vg_str is None or str(vg_str) == "nan"):
        # reference behavior: interp/steps.py:332-333 raise on NaN variogram
        raise ValueError("NaN VG!")
    nuggety = method == "OK" and check_full_nuggetness(vg_str, min_vg_val)

    pinv_cache: dict[tuple, np.ndarray] = {}

    for j in gap_idx:
        # k nearest valid buckets by temporal distance; stable sort so
        # equidistant refs (symmetric around a gap on a regular bucket grid)
        # tie-break by time order, deterministically — same rule as oracle.
        d_all = np.abs(t_ref - t[j])
        nb = np.argsort(d_all, kind="stable")[: min(n_neighbors, len(d_all))]
        dists = d_all[nb]
        zs = v_ref[nb]
        k = len(nb)

        if k == 1:
            out[j] = zs[0]
            codes[j] = M_SINGLE
            continue

        # P6: low-signal step -> neighbor mean
        if np.max(zs) < min_var_val_thresh:
            out[j] = zs.mean()
            codes[j] = M_LOWSIG
            continue

        if method == "NNB":
            out[j] = zs[np.argmin(dists)]
            codes[j] = M_NNB

        elif method == "IDW":
            dm = dists.max()
            dn = dists / dm if dm > 0 else dists
            wts = 1.0 / (dn ** idw_exp)
            wts_sum = wts.sum()
            assert wts_sum >= 1e-14, wts_sum
            out[j] = (wts * zs).sum() / wts_sum
            codes[j] = M_IDW

        elif method == "OK":
            if nuggety:
                out[j] = zs.mean()
                est_var[j] = 0.0
                codes[j] = M_NUGGET
                continue
            key = tuple(nb)
            inv = pinv_cache.get(key)
            if inv is None:
                tt = t_ref[nb]
                dmat = np.abs(tt[:, None] - tt[None, :])
                a = np.zeros((k + 1, k + 1), dtype=np.float64)
                g = vg_vals(vg_str, dmat.ravel()).reshape(k, k)
                np.fill_diagonal(g, 0.0)
                a[:k, :k] = g
                a[k, :k] = 1.0
                a[:, k] = 1.0
                a[k, k] = 0.0
                try:
                    inv = np.linalg.pinv(a)
                except Exception:
                    inv = None
                pinv_cache[key] = inv
            if inv is None:
                # K5: singular system -> NNB fallback
                out[j] = zs[np.argmin(dists)]
                est_var[j] = 0.0
                codes[j] = M_NNB_FALLBACK
                continue
            rhs = np.zeros(k + 1, dtype=np.float64)
            rhs[:k] = vg_vals(vg_str, dists)
            rhs[k] = 1.0
            lmds = inv @ rhs
            if not np.isclose(lmds[:k].sum(), 1.0):
                out[j] = zs[np.argmin(dists)]
                est_var[j] = 0.0
                codes[j] = M_NNB_FALLBACK
            else:
                out[j] = (lmds[:k] * zs).sum()
                est_var[j] = max(0.0, (lmds[:k] * rhs[:k]).sum() + lmds[k])
                codes[j] = M_OK
        else:
            raise NotImplementedError(method)

    # P4 clamp, then round(p) pre-write — observed values untouched,
    # matching the reference which clamps/rounds the interpolated field only.
    filled = codes != M_OBSERVED
    if min_cut is not None:
        out[filled & (out < min_cut)] = min_cut
    if max_cut is not None:
        out[filled & (out > max_cut)] = max_cut
    if round_p is not None:
        out[filled] = np.round(out[filled], round_p)
    return out, est_var, codes


def gapfill(
    spined: DataFrame,
    value_col: str,
    method: str = "IDW",
    vg_dim: DataFrame | None = None,
    coords: DataFrame | None = None,
    tier: str = "1h",
    chunk_buckets: int | None = None,
    pad_buckets: int | None = None,
    **knobs,
) -> DataFrame:
    """Fill gaps of `value_col` in a spined rollup (NULL == gap).

    vg_dim: optional small dim (cluster_id int, vg_str string) for OK —
    broadcast-joined via coords (conv_id -> cluster_id). Output columns:
    conv_id, bucket_ts, <value_col>_filled, est_var, fill_method.
    """
    params = {**DEFAULTS, **knobs}
    secs = TIER_SECONDS[tier]

    df = spined.select(
        "conv_id",
        "bucket_ts",
        F.col(value_col).cast("double").alias("_v"),
        F.unix_timestamp("bucket_ts").alias("_t"),
    )

    if method == "OK":
        if coords is None or vg_dim is None:
            raise ValueError("OK needs coords (conv_id->cluster_id) and vg_dim")
        dim = coords.select("conv_id", "cluster_id").join(
            vg_dim.select("cluster_id", "vg_str"), "cluster_id", "left"
        )
        df = df.join(F.broadcast(dim.select("conv_id", "vg_str")), "conv_id", "left")
    else:
        df = df.withColumn("vg_str", F.lit(None).cast("string"))

    group_cols = ["conv_id"]
    if chunk_buckets:
        if pad_buckets is None:
            pad_buckets = params["n_neighbors"] * 4
        span = chunk_buckets * secs
        pad = pad_buckets * secs
        base = df.select(
            "*",
            F.floor(F.col("_t") / span).alias("_chunk"),
            F.lit(False).alias("_pad"),
        )
        refs = df.where(F.col("_v").isNotNull())
        lpad = refs.where(F.col("_t") % span < pad).select(
            "*",
            (F.floor(F.col("_t") / span) - 1).alias("_chunk"),
            F.lit(True).alias("_pad"),
        )
        rpad = refs.where(F.col("_t") % span >= span - pad).select(
            "*",
            (F.floor(F.col("_t") / span) + 1).alias("_chunk"),
            F.lit(True).alias("_pad"),
        )
        df = base.unionByName(lpad).unionByName(rpad)
        group_cols = ["conv_id", "_chunk"]
    else:
        df = df.select("*", F.lit(0).alias("_chunk"), F.lit(False).alias("_pad"))

    out_schema = (
        "conv_id string, bucket_ts timestamp, value_filled double, "
        "est_var double, fill_method string"
    )

    def fill_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_t", kind="mergesort")
        vg = None
        if method == "OK":
            vgs = pdf["vg_str"].dropna()
            vg = vgs.iloc[0] if len(vgs) else "nan"
        filled, est, codes = fill_series(
            pdf["_t"].to_numpy(np.int64),
            pdf["_v"].to_numpy(np.float64),
            method=method,
            vg_str=vg,
            idw_exp=params["idw_exp"],
            n_neighbors=params["n_neighbors"],
            min_var_val_thresh=params["min_var_val_thresh"],
            min_vg_val=params["min_vg_val"],
            min_cut=params.get("min_cut"),
            max_cut=params.get("max_cut"),
            round_p=params.get("round_p"),
        )
        keep = ~pdf["_pad"].to_numpy()
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].to_numpy()[keep],
                "bucket_ts": pdf["bucket_ts"].to_numpy()[keep],
                "value_filled": filled[keep],
                "est_var": est[keep],
                "fill_method": codes[keep].astype(str),
            }
        )

    return df.groupBy(*group_cols).applyInPandas(fill_group, schema=out_schema)
