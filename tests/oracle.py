"""NumPy/pandas oracle — independent reimplementation of the engine's
semantics straight from the reference formulas (SURVEY.md §5.2). No Spark,
and deliberately *not* importing the engine's fill kernels: plain
per-target loops with no caching, so any caching/vectorization bug in the
engine shows up as a mismatch.

Formula sources (reference file:line):
- variogram models: cyth/interpmthds.pyx:38-95
- OK solve: cyth/interpmthds.pyx:251-362
- IDW max-normalized: interp/steps.py:297-305
- fallback ladder: interp/steps.py:281-330, 403-435
- tier resample + min-count validity: utils/rsmp_nc_in_time.py:300-350
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


# ----------------------------------------------------------- vg models

def vg_eval(vg_str: str, h):
    h = np.asarray(h, dtype=np.float64)
    out = np.zeros_like(h)
    for sub in str(vg_str).split("+"):
        sub = sub.strip()
        sill_s, rest = sub.split(" ")
        model, rng_s = rest.split("(")
        s = float(sill_s)
        r = max(1e-5, float(rng_s.split(")")[0]))
        if model == "Nug":
            out += s
        elif model == "Sph":
            out += np.where(h >= r, s, s * ((1.5 * h) / r - (h * h * h) / (2 * (r * r * r))))
        elif model == "Exp":
            out += s * (1 - np.exp(-3 * h / r))
        elif model == "Lin":
            out += np.where(h > r, s, s * (h / r))
        elif model == "Gau":
            out += s * (1 - np.exp(-3 * ((h * h) / (r * r))))
        elif model == "Pow":
            out += s * np.power(h, r)
        elif model == "Hol":
            v = np.zeros_like(h)
            nz = h != 0
            a = np.pi * h[nz] / r
            v[nz] = s * (1 - np.sin(a) / a)
            out += v
        elif model == "Rng":
            out += h
        else:
            raise ValueError(model)
    return out


def is_nugget(vg_str: str, min_vg_val: float) -> bool:
    vg_str = str(vg_str)
    if vg_str == "nan":
        return False
    sill = 0.0
    rng = 0.0
    names = []
    for sub in vg_str.split("+"):
        sub = sub.strip()
        names.append(sub.split(" ")[1].split("(")[0])
        sill += float(sub.split(" ")[0])
        rng = max(rng, float(sub.split("(")[1].split(")")[0]))
    if sill <= min_vg_val or rng <= min_vg_val:
        return True
    return len(names) == 1 and names[0] == "Nug"


# ----------------------------------------------------------- rollup

def rollup_pandas(turns: pd.DataFrame, tier_seconds: int, min_cnt: int = 1) -> pd.DataFrame:
    df = turns.copy()
    epoch = df["ts"].astype("int64") // 10**9
    df["bucket_ts"] = pd.to_datetime((epoch // tier_seconds) * tier_seconds, unit="s")
    df["_tok"] = df["text"].str.split(" ").str.len()
    df["_toolc"] = df["tool"].notna().astype("int64")
    for r in ("user", "assistant", "tool"):
        df[f"_r_{r}"] = (df["role"] == r).astype("int64")
    g = df.groupby(["conv_id", "bucket_ts"], sort=True).agg(
        turn_cnt=("turn_idx", "size"),
        tok_len_sum=("_tok", "sum"),
        tool_call_cnt=("_toolc", "sum"),
        role_user_cnt=("_r_user", "sum"),
        role_assistant_cnt=("_r_assistant", "sum"),
        role_tool_cnt=("_r_tool", "sum"),
    )
    g = g.reset_index()
    g["valid"] = g["turn_cnt"] >= min_cnt
    return g


METRICS = [
    "turn_cnt", "tok_len_sum", "tool_call_cnt",
    "role_user_cnt", "role_assistant_cnt", "role_tool_cnt",
]


def rollup_tier_pandas(lower: pd.DataFrame, tier_seconds: int, min_cnt: int = 1) -> pd.DataFrame:
    df = lower[lower["valid"]].copy()
    epoch = df["bucket_ts"].astype("int64") // 10**9
    df["bucket_ts"] = pd.to_datetime((epoch // tier_seconds) * tier_seconds, unit="s")
    g = df.groupby(["conv_id", "bucket_ts"], sort=True)[METRICS].sum().reset_index()
    n = df.groupby(["conv_id", "bucket_ts"], sort=True).size().reset_index(name="_n")
    g = g.merge(n, on=["conv_id", "bucket_ts"])
    g["valid"] = g["_n"] >= min_cnt
    for c in METRICS:
        g.loc[~g["valid"], c] = np.nan
    return g.drop(columns="_n")


def spine_pandas(rollup: pd.DataFrame, tier_seconds: int) -> pd.DataFrame:
    """Per-conv calendar spine between first and last bucket; missing rows
    get NaN metrics and valid=False."""
    out = []
    for conv, grp in rollup.groupby("conv_id", sort=True):
        idx = pd.date_range(
            grp["bucket_ts"].min(), grp["bucket_ts"].max(), freq=f"{tier_seconds}s"
        )
        g = grp.set_index("bucket_ts").reindex(idx)
        g.index.name = "bucket_ts"
        g["conv_id"] = conv
        g["valid"] = g["valid"].fillna(False).astype(bool)
        out.append(g.reset_index())
    return pd.concat(out, ignore_index=True)


# ----------------------------------------------------------- gap fill

def fill_one(
    t_target, t_ref, v_ref, method, vg_str=None,
    idw_exp=5.0, n_neighbors=8, min_var_val_thresh=0.1, min_vg_val=1e-4,
    ik_lim=1.0, drift_ref=None, drift_tgt=None,
):
    """Fill a single gap — straight-line reference-formula version."""
    d_all = np.abs(np.asarray(t_ref, float) - float(t_target))
    order = np.argsort(d_all, kind="stable")
    nb = order[: min(n_neighbors, len(order))]
    dists = d_all[nb]
    zs = np.asarray(v_ref, float)[nb]
    k = len(nb)
    if k == 0:
        return math.nan, 0.0, "unfillable"
    if k == 1:
        return float(zs[0]), 0.0, "single_ref"
    if float(np.max(zs)) < min_var_val_thresh:
        return float(zs.mean()), 0.0, "low_signal_mean"
    if method == "NNB":
        return float(zs[np.argmin(dists)]), 0.0, "nnb"
    if method == "IDW":
        dm = dists.max()
        dn = dists / dm if dm > 0 else dists
        w = 1.0 / dn**idw_exp
        return float((w * zs).sum() / w.sum()), 0.0, "idw"
    if method in ("OK", "SK", "EDK", "IK"):
        if is_nugget(vg_str, min_vg_val):
            return float(zs.mean()), 0.0, "nugget_mean"
        tt = np.asarray(t_ref, float)[nb]
        gam = np.zeros((k, k))
        for i in range(k):
            for j in range(k):
                if i != j:
                    gam[i, j] = vg_eval(vg_str, np.array([abs(tt[i] - tt[j])]))[0]
        total_sill = sum(float(s.strip().split(" ")[0]) for s in str(vg_str).split("+"))
        if method == "SK":
            a = total_sill - gam
            inv = np.linalg.pinv(a)
            rhs = total_sill - vg_eval(vg_str, dists)
            lm = inv @ rhs
            est = float((lm * zs).sum())
            ev = max(0.0, float(total_sill - (lm * rhs).sum()))
            return est, ev, "ok"
        if method == "EDK":
            # m external drifts -> m border rows/cols (pyx:588-719); the
            # default single drift is linear time in days since first ref
            if drift_ref is None:
                t0 = float(np.asarray(t_ref, float).min())
                dr = ((np.asarray(t_ref, float) - t0) / 86400.0)[:, None]
                dt = np.array([(float(t_target) - t0) / 86400.0])
            else:
                dr = np.asarray(drift_ref, float)
                dr = dr[:, None] if dr.ndim == 1 else dr
                dt = np.atleast_1d(np.asarray(drift_tgt, float))
            m = dr.shape[1]
            dr_nb = dr[nb]
            a = np.zeros((k + 1 + m, k + 1 + m))
            a[:k, :k] = gam
            a[k, :k] = 1.0
            a[:k, k] = 1.0
            for q in range(m):
                a[k + 1 + q, :k] = dr_nb[:, q]
                a[:k, k + 1 + q] = dr_nb[:, q]
            inv = np.linalg.pinv(a)
            rhs = np.zeros(k + 1 + m)
            rhs[:k] = vg_eval(vg_str, dists)
            rhs[k] = 1.0
            rhs[k + 1:] = dt
            lm = inv @ rhs
            if not np.isclose(lm[:k].sum(), 1.0):
                return float(zs[np.argmin(dists)]), 0.0, "nnb_fallback"
            return float((lm[:k] * zs).sum()), 0.0, "ok"
        a = np.zeros((k + 1, k + 1))
        a[:k, :k] = gam
        a[k, :k] = 1.0
        a[:, k] = 1.0
        a[k, k] = 0.0
        inv = np.linalg.pinv(a)
        rhs = np.zeros(k + 1)
        rhs[:k] = vg_eval(vg_str, dists)
        rhs[k] = 1.0
        lm = inv @ rhs
        if not np.isclose(lm[:k].sum(), 1.0):
            return float(zs[np.argmin(dists)]), 0.0, "nnb_fallback"
        if method == "IK":
            ix = np.where(zs <= ik_lim, 1.0, 0.0)
            ik = max(0.0, float((lm[:k] * ix).sum()))
            return ik, max(0.0, ik * (1.0 - ik)), "ok"
        est = float((lm[:k] * zs).sum())
        ev = max(0.0, float((lm[:k] * rhs[:k]).sum() + lm[k]))
        return est, ev, "ok"
    raise NotImplementedError(method)


def fill_series_oracle(
    t, v, method, vg_str=None, round_p=2, min_cut=None, max_cut=None,
    drifts=None, **kw
):
    t = np.asarray(t, float)
    v = np.asarray(v, float)
    out = v.copy()
    evs = np.zeros_like(v)
    codes = np.array(["observed"] * len(v), dtype=object)
    refs = ~np.isnan(v)
    if drifts is not None:
        drifts = np.asarray(drifts, float)
        drifts = drifts[:, None] if drifts.ndim == 1 else drifts
    for j in np.flatnonzero(np.isnan(v)):
        if drifts is not None:
            kw = {**kw, "drift_ref": drifts[refs], "drift_tgt": drifts[j]}
        est, ev, code = fill_one(t[j], t[refs], v[refs], method, vg_str, **kw)
        if code != "unfillable":
            if min_cut is not None:
                est = max(est, min_cut)
            if max_cut is not None:
                est = min(est, max_cut)
            if round_p is not None:
                est = float(np.round(est, round_p))
        out[j] = est
        evs[j] = ev
        codes[j] = code
    return out, evs, codes
