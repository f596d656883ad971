"""Golden-parquet oracles for the kernel queries (VERDICT r2 next-step #1).

The pinv/DE kernel queries (gapfill_* kriging, variogram fits, KS merge)
are not SQL-expressible, so their DuckDB oracle is a `read_parquet` of a
GOLDEN file materialized here — computed by the INDEPENDENT NumPy oracle in
tests/oracle.py (per-gap loops, its own vg_eval / DE / pinv chain; it never
imports the engine's kernels). The driver's rows/schema/value-hash gate then
applies end-to-end, exactly like every other oracled query.

Goldens are deterministic functions of the fixture parquet (seed-pure,
sources/fixtures.py) and are committed under golden/; regeneration is lazy
and idempotent. tests/test_golden.py regenerates one from scratch and
asserts it matches the committed bytes, so fixture drift cannot go unseen.

Reference anchors for what each golden encodes:
- OK/SK/EDK/IK solves: cyth/interpmthds.pyx:251-362, 474-719
- DE fit + AIC:        variograms/vgs.py:661-848
- KS cluster merge:    vgclus/tvgs_clus.py:294-498
- regime broadcast:    vgclus/tvg_fit.py:58-96
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.abspath(__file__))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from spinterps_spark.sources import fixtures  # noqa: E402
from tests import oracle  # noqa: E402

GOLDEN_DIR = os.path.join(ROOT, "golden")


# ------------------------------------------------------- oracle chain

class _Chain:
    """Lazily computed independent-oracle intermediates for one sf dir."""

    def __init__(self, sf_dir: str):
        self.sf_dir = sf_dir
        self._cache: dict[str, object] = {}

    def _get(self, key, fn):
        if key not in self._cache:
            self._cache[key] = fn()
        return self._cache[key]

    @property
    def coords(self) -> pd.DataFrame:
        return self._get(
            "coords", lambda: pd.read_parquet(fixtures.coords_path(self.sf_dir))
        )

    @property
    def h1(self) -> pd.DataFrame:
        def build():
            t = pd.read_parquet(fixtures.transcripts_path(self.sf_dir))
            # fixture parquet is TIMESTAMP_MICROS; the oracle's epoch math
            # (astype int64 // 1e9) assumes nanosecond datetimes
            t["ts"] = t["ts"].astype("datetime64[ns]")
            m1 = oracle.rollup_pandas(t, 60)
            h1 = oracle.rollup_tier_pandas(m1, 3600, min_cnt=1)
            h1["v"] = h1["tok_len_sum"] / h1["turn_cnt"]
            return h1

        return self._get("h1", build)

    @property
    def spine(self) -> pd.DataFrame:
        def build():
            sp = oracle.spine_pandas(self.h1, 3600)
            sp["v"] = sp["tok_len_sum"] / sp["turn_cnt"]
            sp["t"] = sp["bucket_ts"].astype("int64") // 10**9
            return sp.sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)

        return self._get("spine", build)

    def evg(self, regime: bool = False) -> pd.DataFrame:
        def build():
            ser = self.h1[["conv_id", "v"]].copy()
            ser["t"] = self.h1["bucket_ts"].astype("int64") // 10**9
            ser = ser.rename(columns={"v": "z"})
            if regime:
                ser["regime"] = self.h1["bucket_ts"].dt.strftime("%Y-%m")
            return oracle.evg_binned_oracle(ser, self.coords, regime=regime)

        return self._get(f"evg_{regime}", build)

    def fit_dim(self, regime: bool = False) -> pd.DataFrame:
        def build():
            evg = self.evg(regime)
            keys = ["cluster_id"] + (["regime"] if regime else [])
            rows = []
            for key, grp in evg.groupby(keys, sort=True):
                grp = grp.sort_values("bin")
                vg, aic = oracle.fit_vg_oracle(
                    grp["lag"].to_numpy(), grp["gamma"].to_numpy(),
                    grp["n_pairs"].to_numpy(), seed=1,
                )
                key = key if isinstance(key, tuple) else (key,)
                rows.append((*key, vg, aic, len(grp)))
            return pd.DataFrame(rows, columns=keys + ["vg_str", "aic", "n_bins"])

        return self._get(f"fit_{regime}", build)

    def conv_vg(self) -> dict[str, str]:
        """conv_id -> global cluster vg_str (the gapfill broadcast dim)."""
        def build():
            fit = self.fit_dim(False)
            cl_vg = dict(zip(fit["cluster_id"], fit["vg_str"]))
            return {
                c: cl_vg.get(k, "nan")
                for c, k in zip(self.coords["conv_id"], self.coords["cluster_id"])
            }

        return self._get("conv_vg", build)

    def conv_cluster(self) -> dict:
        return self._get(
            "conv_cluster",
            lambda: dict(zip(self.coords["conv_id"], self.coords["cluster_id"])),
        )

    def filled(self, method: str, **kw) -> pd.DataFrame:
        """Per-row expected gapfill output over the 1h spine."""
        sp = self.spine
        conv_vg = self.conv_vg()
        out = []
        for conv, grp in sp.groupby("conv_id", sort=True):
            t = grp["t"].to_numpy(np.int64)
            v = grp["v"].to_numpy(np.float64)
            kw_c = dict(kw)
            if "vg_by_regime" in kw_c:
                vg_map = kw_c.pop("vg_by_regime")
                months = grp["bucket_ts"].dt.strftime("%Y-%m").to_numpy()
                cl = self.conv_cluster()[conv]
                glob = conv_vg[conv]
                vg_rows = np.array(
                    [vg_map.get((cl, m), glob) for m in months], dtype=object
                )
                f, ev, cd = oracle.fill_series_oracle(
                    t, v, method, vg_per_row=vg_rows, **kw_c
                )
            else:
                vg = conv_vg[conv] if method in ("OK", "SK", "EDK", "IK") else None
                f, ev, cd = oracle.fill_series_oracle(t, v, method, vg_str=vg, **kw_c)
            out.append(
                pd.DataFrame(
                    {
                        "conv_id": conv,
                        "bucket_ts": grp["bucket_ts"].to_numpy(),
                        "value_filled": f,
                        "est_var": ev,
                        "fill_method": cd.astype(str),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)


_CHAINS: dict[str, _Chain] = {}


def _chain(sf_dir: str) -> _Chain:
    if sf_dir not in _CHAINS:
        _CHAINS[sf_dir] = _Chain(sf_dir)
    return _CHAINS[sf_dir]


# ------------------------------------------------------ golden builders

def _g_variogram_fit_dim(ch: _Chain) -> pd.DataFrame:
    return ch.fit_dim(False)[["cluster_id", "vg_str", "aic", "n_bins"]]


def _g_variogram_fit_regime(ch: _Chain) -> pd.DataFrame:
    return ch.fit_dim(True)[["cluster_id", "regime", "vg_str", "aic", "n_bins"]]


def _g_variogram_nbest_dim(ch: _Chain) -> pd.DataFrame:
    evg = ch.evg(False)
    rows = []
    for c, grp in evg.groupby("cluster_id", sort=True):
        grp = grp.sort_values("bin")
        res = oracle.fit_vg_nbest_oracle(
            grp["lag"].to_numpy(), grp["gamma"].to_numpy(),
            grp["n_pairs"].to_numpy(), n_best=3, seed=1,
        )
        for r, (aic, vg) in enumerate(res, start=1):
            rows.append((c, r, vg, aic))
    return pd.DataFrame(rows, columns=["cluster_id", "rank", "vg_str", "aic"])


def _g_vg_cluster_merge(ch: _Chain) -> pd.DataFrame:
    dim = ch.fit_dim(False).sort_values("cluster_id").reset_index(drop=True)
    return oracle.ks_merge_oracle(dim[["cluster_id", "vg_str"]])


def _prep_regime(ch: _Chain) -> dict:
    fit_r = ch.fit_dim(True)
    vg_map = {
        (c, r): (v if v != "nan" else None)
        for c, r, v in zip(fit_r["cluster_id"], fit_r["regime"], fit_r["vg_str"])
    }
    return {k: v for k, v in vg_map.items() if v is not None}


def _g_gapfill_ok_fitted(ch: _Chain) -> pd.DataFrame:
    return ch.filled("OK")


def _g_gapfill_ok_regime(ch: _Chain) -> pd.DataFrame:
    return ch.filled("OK", vg_by_regime=_prep_regime(ch))


def _g_gapfill_edk(ch: _Chain) -> pd.DataFrame:
    return ch.filled("EDK")


def _g_gapfill_edk_multi(ch: _Chain) -> pd.DataFrame:
    sp = ch.spine.copy()
    sp["d0"] = (sp["t"] / 86400.0).astype(np.float64)
    # pure-arithmetic diurnal ramp (no libm: JVM Math.sin and np.sin may
    # differ by 1 ulp, which would poison the kriging matrix parity)
    e = (sp["bucket_ts"].dt.hour.to_numpy(np.int64) - 11.5) / 11.5
    sp["d1"] = e * e
    conv_vg = ch.conv_vg()
    out = []
    for conv, grp in sp.groupby("conv_id", sort=True):
        dr = grp[["d0", "d1"]].to_numpy(np.float64)
        f, ev, cd = oracle.fill_series_oracle(
            grp["t"].to_numpy(np.int64), grp["v"].to_numpy(np.float64),
            "EDK", vg_str=conv_vg[conv], drifts=dr,
        )
        out.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "bucket_ts": grp["bucket_ts"].to_numpy(),
                    "value_filled": f,
                    "est_var": ev,
                    "fill_method": cd.astype(str),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def _g_gapfill_ik(ch: _Chain) -> pd.DataFrame:
    return ch.filled("IK", ik_lim=15.0)


BUILDERS = {
    "variogram_fit_dim": _g_variogram_fit_dim,
    "variogram_fit_regime": _g_variogram_fit_regime,
    "variogram_nbest_dim": _g_variogram_nbest_dim,
    "vg_cluster_merge": _g_vg_cluster_merge,
    "gapfill_ok_fitted": _g_gapfill_ok_fitted,
    "gapfill_ok_regime": _g_gapfill_ok_regime,
    "gapfill_edk": _g_gapfill_edk,
    "gapfill_edk_multi": _g_gapfill_edk_multi,
    "gapfill_ik": _g_gapfill_ik,
}

# arrow schemas: int32 where the Spark side emits IntegerType so the
# driver's dtype-sensitive hash sees identical kinds on both sides
_SCHEMAS = {
    "variogram_fit_dim": [
        ("cluster_id", pa.int32()), ("vg_str", pa.string()),
        ("aic", pa.float64()), ("n_bins", pa.int32()),
    ],
    "variogram_fit_regime": [
        ("cluster_id", pa.int32()), ("regime", pa.string()),
        ("vg_str", pa.string()), ("aic", pa.float64()), ("n_bins", pa.int32()),
    ],
    "variogram_nbest_dim": [
        ("cluster_id", pa.int32()), ("rank", pa.int32()),
        ("vg_str", pa.string()), ("aic", pa.float64()),
    ],
    "vg_cluster_merge": [
        ("cluster_id", pa.int32()), ("merged_id", pa.int32()),
        ("vg_str", pa.string()),
    ],
}
_FILL_SCHEMA = [
    ("conv_id", pa.string()), ("bucket_ts", pa.timestamp("us")),
    ("value_filled", pa.float64()), ("est_var", pa.float64()),
    ("fill_method", pa.string()),
]


def _schema(name: str) -> pa.schema:
    return pa.schema(_SCHEMAS.get(name, _FILL_SCHEMA))


def build_golden(name: str, sf_dir: str) -> pd.DataFrame:
    return BUILDERS[name](_chain(sf_dir))


def golden_path(name: str, sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(GOLDEN_DIR, sf, f"{name}.parquet")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pdf = build_golden(name, sf_dir)
        table = pa.Table.from_pandas(
            pdf, schema=_schema(name), preserve_index=False
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return path


def golden_sql(name: str, sf_dir: str) -> str:
    return f"SELECT * FROM read_parquet('{golden_path(name, sf_dir)}')"


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    for n in BUILDERS:
        p = golden_path(n, sf)
        print(n, "->", p, pq.read_metadata(p).num_rows, "rows")
