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
        g["valid"] = g["valid"].eq(True)  # NaN (spine gap) -> False
        out.append(g.reset_index())
    return pd.concat(out, ignore_index=True)


# ------------------------------------------------- empirical variogram

def evg_binned_oracle(
    series: pd.DataFrame,
    coords: pd.DataFrame,
    max_lag: float = 48 * 3600,
    lag_width: float = 3600.0,
    regime: bool = False,
) -> pd.DataFrame:
    """Independent 'mean'-estimator empirical variogram: per-conversation
    O(n^2) pair enumeration (no horizon bucketing — the thing the engine
    optimizes), pooled per cluster[, regime], constant-width bins, with the
    engine's exact long-sum aggregate semantics replicated digit-for-digit.
    series: (conv_id, t_epoch_sec, z[, regime])."""
    cl = dict(zip(coords["conv_id"], coords["cluster_id"]))
    rows = []
    for conv, grp in series.groupby("conv_id", sort=True):
        t = grp["t"].to_numpy(np.int64)
        z = grp["z"].to_numpy(np.float64)
        order = np.argsort(t, kind="stable")
        t, z = t[order], z[order]
        reg = grp["regime"].to_numpy()[order] if regime else None
        dt = t[None, :] - t[:, None]
        keep = (dt > 0) & (dt <= max_lag)
        if regime:
            keep &= reg[None, :] == reg[:, None]
        iu, ju = np.nonzero(keep)
        if len(iu) == 0:
            continue
        h = (t[ju] - t[iu]).astype(np.float64)
        sq = (z[iu] - z[ju]) ** 2
        r = pd.DataFrame(
            {"cluster_id": cl[conv], "h": h, "sq": sq,
             "bin": np.floor(h / lag_width).astype(np.int64)}
        )
        if regime:
            r["regime"] = reg[iu]
        rows.append(r)
    pairs = pd.concat(rows, ignore_index=True)
    keys = ["cluster_id"] + (["regime"] if regime else []) + ["bin"]
    out = []
    for key, grp in pairs.groupby(keys, sort=True):
        n = len(grp)
        # engine r4 semantics (operators/variogram.py agg): lag = exact
        # BIGINT sum of integer-second h; gamma = 0.5 * (fixed-point 1e-4
        # BIGINT sum of sq) / n. Both pure IEEE arithmetic, replicated here
        # op-for-op (floor(x*1e4+0.5) per element, exact int64 sum).
        h_sum = int(grp["h"].to_numpy(np.float64).astype(np.int64).sum())
        sq_q = np.floor(grp["sq"].to_numpy(np.float64) * 1e4 + 0.5).astype(np.int64)
        lag = float(h_sum) / n
        gamma = 0.5 * (float(sq_q.sum()) / 1e4) / n
        out.append((*key, n, lag, gamma))
    return pd.DataFrame(
        out, columns=keys[:-1] + ["bin", "n_pairs", "lag", "gamma"]
    )


# --------------------------------------------------------- DE model fit

ORACLE_MODEL_MIXES = (
    ["Sph"], ["Exp"], ["Gau"], ["Lin"],
    ["Nug", "Sph"], ["Nug", "Exp"],
)


def de_minimize_oracle(obj, bounds, seed, n_pop=24, n_iter=120, f_w=0.8, cr=0.9):
    """rand/1/bin differential evolution (Storn & Price 1997), written to
    the same published spec as the engine's: seeded RandomState stream,
    uniform init, per-member mutation/crossover/greedy-select. Bit-exact
    reproducibility REQUIRES the same RNG call order, so the stream
    structure matches by construction; the model-curve evaluation inside
    `obj` is this module's own vg_eval, not the engine's."""
    rng = np.random.RandomState(seed)
    d = len(bounds)
    lo, hi = bounds[:, 0], bounds[:, 1]
    pop = lo + rng.rand(n_pop, d) * (hi - lo)
    costs = np.array([obj(x) for x in pop])
    for _ in range(n_iter):
        for i in range(n_pop):
            idx = rng.choice(n_pop, 3, replace=False)
            mutant = np.clip(pop[idx[0]] + f_w * (pop[idx[1]] - pop[idx[2]]), lo, hi)
            cross = rng.rand(d) < cr
            cross[rng.randint(d)] = True
            trial = np.where(cross, mutant, pop[i])
            c = obj(trial)
            if c <= costs[i]:
                pop[i] = trial
                costs[i] = c
    best = int(np.argmin(costs))
    return pop[best], costs[best]


def fit_vg_oracle(lags, gammas, n_pairs=None, mixes=ORACLE_MODEL_MIXES, seed=1):
    """Weighted-SSE DE fit + AIC pick (reference variograms/vgs.py:661-848
    semantics), independent of the engine: curves come from vg_eval above."""
    lags = np.asarray(lags, dtype=np.float64)
    gammas = np.asarray(gammas, dtype=np.float64)
    ok = np.isfinite(lags) & np.isfinite(gammas)
    lags, gammas = lags[ok], gammas[ok]
    if n_pairs is not None:
        n_pairs = np.asarray(n_pairs, dtype=np.float64)[ok]
    if len(lags) < 3:
        return "nan", float("inf")
    if n_pairs is not None:
        wts = n_pairs / np.maximum(gammas, 1e-12) ** 2
    else:
        wts = np.ones_like(lags)
    var2 = 2.0 * max(float(np.var(gammas)), float(np.max(gammas)), 1e-6)
    min_lag, max_lag = float(lags.min()), float(lags.max())
    fits = []
    for mix in mixes:
        k = 2 * len(mix)

        def obj(x, _mix=mix):
            g = np.zeros_like(lags)
            for m_i, name in enumerate(_mix):
                g += vg_eval(f"{x[2 * m_i]} {name}({x[2 * m_i + 1]})", lags)
            return float(np.sum(wts * (gammas - g) ** 2))

        bounds = []
        for name in mix:
            if name == "Nug":
                bounds.append([1e-9, var2])
                bounds.append([1e-5, 1.0])
            else:
                bounds.append([1e-9, var2])
                bounds.append([min_lag, max_lag * 2.0])
        x, cost = de_minimize_oracle(obj, np.array(bounds), seed=seed)
        n = len(lags)
        aic = n * np.log(max(cost, 1e-300)) + 2 * k
        parts = " + ".join(
            f"{x[2 * i]:.6f} {name}({x[2 * i + 1]:.6f})" for i, name in enumerate(mix)
        )
        fits.append((float(aic), parts))
    fits.sort(key=lambda f: f[0])
    return fits[0][1], fits[0][0]


def fit_vg_nbest_oracle(lags, gammas, n_pairs=None, n_best=3, seed=1):
    results = []
    for mix in ORACLE_MODEL_MIXES:
        s, a = fit_vg_oracle(lags, gammas, n_pairs, mixes=(mix,), seed=seed)
        if s != "nan":
            results.append((a, s))
    results.sort(key=lambda f: f[0])
    return results[:n_best]


# ------------------------------------------------------ KS cluster merge

def ok_weight_sample_oracle(vg_str, seed, n_cfgs=24, k=6, horizon=48 * 3600):
    """Sorted OK-weight sample over seeded random neighbor configs — the
    engine's quirks preserved deliberately: the Lagrange corner a[k,k] ends
    up 1.0 (row then full-column assignment), diag(gamma)=0."""
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_cfgs):
        offs = np.sort(rng.uniform(-horizon, horizon, k))
        dmat = np.abs(offs[:, None] - offs[None, :])
        a = np.zeros((k + 1, k + 1))
        g = vg_eval(vg_str, dmat.ravel()).reshape(k, k)
        np.fill_diagonal(g, 0.0)
        a[:k, :k] = g
        a[k, :k] = 1.0
        a[:, k] = 1.0
        rhs = np.zeros(k + 1)
        rhs[:k] = vg_eval(vg_str, np.abs(offs))
        rhs[k] = 1.0
        lm = np.linalg.pinv(a) @ rhs
        out.append(lm[:k])
    return np.sort(np.concatenate(out))


def ks_stat_oracle(a, b):
    allv = np.sort(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def ks_merge_oracle(dim: pd.DataFrame, alpha_c=1.36, seed=11, n_cfgs=24, k=6):
    """Greedy KS merge + mean-curve refit, straight-line loop (no rep-sample
    memoization — the engine's memo must be value-invisible)."""
    items = list(dim[["cluster_id", "vg_str"]].itertuples(index=False))
    samples = {
        c: ok_weight_sample_oracle(v, seed=seed + int(c), n_cfgs=n_cfgs, k=k)
        for c, v in items if v != "nan"
    }
    by_id = {i.cluster_id: i.vg_str for i in items}
    merged, reps = {}, {}
    for c, v in items:
        if v == "nan":
            merged[c] = [c]
            reps[c] = v
            continue
        placed = False
        for m_id in list(reps):
            if reps[m_id] == "nan":
                continue
            a = samples[c]
            b = ok_weight_sample_oracle(
                reps[m_id], seed=seed + 10_000 + m_id, n_cfgs=n_cfgs, k=k
            )
            d = ks_stat_oracle(a, b)
            thr = alpha_c * np.sqrt((len(a) + len(b)) / (len(a) * len(b)))
            if d <= thr:
                merged[m_id].append(c)
                lags = np.linspace(60, 72 * 3600, 64)
                curves = [vg_eval(by_id[m], lags) for m in merged[m_id]]
                mean_curve = np.mean(np.stack(curves), axis=0)
                new_vg, _aic = fit_vg_oracle(lags, mean_curve, seed=seed)
                reps[m_id] = new_vg
                placed = True
                break
        if not placed:
            merged[c] = [c]
            reps[c] = v
    rows = []
    for m_id, members in merged.items():
        for c in members:
            rows.append((c, m_id, reps[m_id]))
    return pd.DataFrame(rows, columns=["cluster_id", "merged_id", "vg_str"])


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
    drifts=None, vg_per_row=None, **kw
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
        vg_j = vg_per_row[j] if vg_per_row is not None else vg_str
        est, ev, code = fill_one(t[j], t[refs], v[refs], method, vg_j, **kw)
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
