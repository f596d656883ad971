"""Bit-exactness of the vectorized batch Gorilla kernels vs the scalar
codec (compress/gorilla.py is the reference implementation; gorilla_vec.py
must produce byte-identical streams and bit-identical decodes)."""

import numpy as np
import pytest

from spinterps_spark.compress.gorilla import (
    decode_ts,
    decode_vals,
    encode_chunk,
    encode_ts,
    encode_vals,
)
from spinterps_spark.compress.gorilla_vec import (
    decode_ts_many,
    decode_vals_many,
    encode_ts_many,
    encode_vals_many,
)


def _adversarial_groups():
    rng = np.random.default_rng(1234)
    groups = []
    for trial in range(300):
        kind = trial % 6
        if kind == 0:  # dense regular cadence, 2-decimal values (pipeline)
            n = int(rng.integers(1, 130))
            ts = np.arange(n, dtype=np.int64) * 60 + 1_700_000_000
            vals = np.round(rng.normal(50, 20, n), 2)
        elif kind == 1:  # irregular cadence, NaN/denormal/huge payloads
            n = max(1, int(rng.integers(1, 120)))
            ts = np.unique(np.sort(rng.integers(0, 10**9, n)).astype(np.int64))
            n = len(ts)
            vals = rng.choice(
                [np.nan, 0.0, 1.5, -3.75, 1e300, 5e-324, 7.0], n)
        elif kind == 2:  # constant values (all-zero xor stream)
            n = int(rng.integers(1, 50))
            ts = np.arange(n, dtype=np.int64) * 3600
            vals = np.full(n, 7.25)
        elif kind == 3:  # 64-bit dod escapes, negative zero
            ts = np.array([0, 1, 2**40, 2**40 + 5, 2**62], dtype=np.int64)
            vals = np.array([1.0, 1.0, 2.0, np.nan, -0.0])
        elif kind == 4:  # window thrash: wide/narrow xors alternating
            n = int(rng.integers(2, 40))
            ts = np.sort(rng.choice(10**6, n, replace=False)).astype(np.int64)
            vals = np.where(rng.random(n) < 0.5, 5.0,
                            np.round(rng.normal(0, 1e6, n), 0))
        else:  # dod class boundaries (+-64, +-256, +-2048)
            deltas = rng.choice(
                [1, 63, 64, 65, 255, 256, 257, 2047, 2048, 2049, 10**7],
                int(rng.integers(1, 30)))
            ts = np.concatenate(([0], np.cumsum(deltas))).astype(np.int64)
            vals = np.round(rng.normal(0, 3, len(ts)), 1)
        groups.append((ts, vals))
    return groups


@pytest.fixture(scope="module")
def groups():
    return _adversarial_groups()


def test_encode_many_bit_identical(groups):
    ts_flat = np.concatenate([g[0] for g in groups])
    v_flat = np.concatenate([g[1] for g in groups])
    lens = np.array([len(g[0]) for g in groups])
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    got_ts = encode_ts_many(ts_flat, starts)
    got_vs = encode_vals_many(v_flat, starts)
    for i, (ts, vals) in enumerate(groups):
        assert got_ts[i] == encode_ts(ts)
        assert got_vs[i] == encode_vals(vals)


def test_decode_many_bit_identical(groups):
    chunks = [encode_chunk(ts, vals) for ts, vals in groups]
    ns = np.array([c["n"] for c in chunks], dtype=np.int64)
    fv = np.array([c["first_val"] for c in chunks], dtype=np.float64)
    ft = np.array([c["first_ts"] for c in chunks], dtype=np.int64)
    got_v = decode_vals_many(fv, [c["vals_xor"] for c in chunks], ns)
    got_t = decode_ts_many(ft, [c["ts_d2d"] for c in chunks], ns)
    off = 0
    for c in chunks:
        n = c["n"]
        ref_v = decode_vals(c["first_val"], c["vals_xor"], n)
        ref_t = decode_ts(c["first_ts"], c["ts_d2d"], n)
        assert np.array_equal(ref_v.view(np.uint64),
                              got_v[off:off + n].view(np.uint64))
        assert np.array_equal(ref_t, got_t[off:off + n])
        off += n


def test_empty_and_degenerate():
    assert encode_ts_many(np.zeros(0, np.int64), np.zeros(0, np.int64)) == []
    assert encode_vals_many(np.zeros(0, np.float64),
                            np.zeros(0, np.int64)) == []
    # single-point chunks only: empty streams, firsts pass through
    ts = np.array([5, 99], dtype=np.int64)
    vals = np.array([1.5, -2.5])
    starts = np.array([0, 1], dtype=np.int64)
    assert encode_ts_many(ts, starts) == [b"", b""]
    assert encode_vals_many(vals, starts) == [b"", b""]
    got_t = decode_ts_many(ts, [b"", b""], np.array([1, 1]))
    got_v = decode_vals_many(vals, [b"", b""], np.array([1, 1]))
    assert np.array_equal(got_t, ts)
    assert np.array_equal(got_v, vals)


def test_hypothesis_style_roundtrip_random():
    rng = np.random.default_rng(77)
    for _ in range(100):
        n = int(rng.integers(1, 200))
        ts = np.cumsum(rng.integers(1, 10**6, n)).astype(np.int64)
        vals = rng.standard_normal(n) * 10.0 ** rng.integers(-3, 8)
        vals[rng.random(n) < 0.1] = np.nan
        c = encode_chunk(ts, vals)
        starts = np.array([0], dtype=np.int64)
        assert encode_ts_many(ts, starts)[0] == c["ts_d2d"]
        assert encode_vals_many(vals, starts)[0] == c["vals_xor"]
        dt = decode_ts_many(np.array([c["first_ts"]]), [c["ts_d2d"]],
                            np.array([n]))
        dv = decode_vals_many(np.array([c["first_val"]]), [c["vals_xor"]],
                              np.array([n]))
        assert np.array_equal(dt, ts)
        assert np.array_equal(dv.view(np.uint64),
                              np.asarray(vals).view(np.uint64))


def test_insert_plan_matches_np_insert():
    """r8: _pack_pairs/_assemble replaced np.insert with a shared-position
    scatter (_insert_plan/_insert_many); the index arithmetic must match
    np.insert exactly for sorted positions incl. duplicates and edges."""
    from spinterps_spark.compress.gorilla_vec import _insert_plan, _insert_many

    rng = np.random.default_rng(5)
    for _ in range(200):
        n = int(rng.integers(0, 50))
        m = int(rng.integers(0, 20))
        base = rng.integers(0, 1000, n).astype(np.uint64)
        ins = np.sort(rng.integers(0, n + 1, m))
        vals = rng.integers(0, 1000, m).astype(np.uint64)
        ipos, bmask = _insert_plan(ins, n)
        got = _insert_many(base, ipos, bmask, vals)
        want = np.insert(base, ins, vals)
        assert np.array_equal(got, want), (base, ins, vals)
        # a second array sharing the same plan (the production pattern)
        base2 = rng.standard_normal(n)
        vals2 = rng.standard_normal(m)
        got2 = _insert_many(base2, ipos, bmask, vals2)
        assert np.array_equal(got2, np.insert(base2, ins, vals2))
