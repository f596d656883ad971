"""Vectorized batch kernels for the Gorilla codec (VERDICT r7 next-step #1).

The scalar codec in compress/gorilla.py decodes/encodes one chunk at a time
with a per-token Python loop — the engine's last row-at-a-time Python
surface. These kernels process EVERY chunk of an Arrow batch at once:

- decode: "lockstep" parsing — numpy state arrays (bit position, window
  state) advance one token per iteration across all chunks ("lanes")
  simultaneously, so the per-iteration cost is a handful of vectorized ops
  over C lanes instead of Python work per point. Value reconstruction is a
  segmented XOR prefix scan; timestamps are two segmented cumulative sums.
- encode: the timestamp stream is STATELESS (control class depends only on
  the delta-of-delta value), so classification is a single vectorized pass;
  the value stream's window-reuse state machine locksteps over nonzero
  XORs only (zero runs collapse to one (0, gap) pair, computed from
  positions). Bit packing deposits (value, nbits<=64) pairs into 64-bit
  words via bitwise_or.reduceat — no per-bit expansion.

Everything is bit-for-bit identical to the scalar codec (asserted by
tests/test_gorilla_vec.py over adversarial and random inputs, and by the
unchanged gorilla_roundtrip oracle row): all arithmetic is uint64 mod 2^64,
which is exactly the BitWriter/BitReader semantics.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------- helpers

def _bitlen32(y: np.ndarray) -> np.ndarray:
    """Exact bit_length for uint64 arrays with values < 2^32 (the float64
    mantissa holds 53 bits, so the frexp exponent is exact here)."""
    return np.frexp(y.astype(np.float64))[1].astype(np.int64)


def _bitlen64(x: np.ndarray) -> np.ndarray:
    hi = x >> U64(32)
    lo = x & U64(0xFFFFFFFF)
    return np.where(hi != 0, 32 + _bitlen32(hi), _bitlen32(lo))


def _lead_trail(x: np.ndarray):
    """Leading-zero count (clamped to 63, matching the scalar encoder's
    6-bit lead field) and trailing-zero count of nonzero uint64 x.
    Garbage where x == 0 — callers mask."""
    lead = np.minimum(64 - _bitlen64(x), 63)
    low = x & (~x + U64(1))
    trail = _bitlen64(low) - 1
    return lead, trail


def _prep_windows(streams: list):
    """Concatenate byte streams; return (v64, b8, base_bits): v64[k] = the
    big-endian uint64 of padded-buffer bytes k..k+7, b8[k] = byte k+8 (as
    uint64), base_bits[c] = absolute bit offset of stream c. A window of
    bits [pos, pos+64) is (v64[pos>>3] << (pos&7)) | (b8[pos>>3] >> (8-(pos&7)))."""
    lens = np.fromiter((len(s) for s in streams), dtype=np.int64,
                       count=len(streams))
    base_bytes = np.concatenate(([0], np.cumsum(lens)))
    buf = np.frombuffer(b"".join(streams), dtype=np.uint8)
    # +24 pad: a token at the very end of the last stream still gathers a
    # full 64-bit window (plus the b8 byte) beyond its final payload bit —
    # e.g. a '11' value token reads bits [pos+14, pos+14+64) + 8 more,
    # up to ~9 bytes past the buffer. Keep those reads in bounds.
    pad = np.zeros(len(buf) + 24, dtype=np.uint8)
    pad[: len(buf)] = buf
    a = pad.astype(np.uint64)
    v64 = a[:-9].copy()
    for j in range(1, 8):
        v64 <<= U64(8)
        v64 |= a[j:j - 9]
    return v64, a[8:-1], base_bytes[:-1] * 8


def _window(v64, b8, pos):
    """Bits pos..pos+63 of the buffer, top-aligned, per lane."""
    k = pos >> U64(3)
    r = pos & U64(7)
    return (v64[k] << r) | (b8[k] >> (U64(8) - r))


# ---------------------------------------------------------------- decode

def decode_vals_many(first_vals: np.ndarray, streams: list,
                     ns: np.ndarray) -> np.ndarray:
    """Decode many value streams at once; returns the flat float64 array of
    sum(ns) values in chunk order. Bit-identical to decode_vals per chunk."""
    C = len(streams)
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    xs = np.zeros(total, dtype=np.uint64)
    if total == 0:
        return xs.view(np.float64)
    base_out = np.concatenate(([0], np.cumsum(ns)))[:-1]
    firsts = np.ascontiguousarray(first_vals, dtype=np.float64).view(np.uint64)
    if C == 0 or not (ns > 1).any():
        out = xs
        out[base_out] = firsts
        return out.view(np.float64)
    v64, b8, base_bits = _prep_windows(streams)
    # lanes sorted by DESCENDING token count: the active set at lockstep
    # iteration j is a PREFIX of the sorted order (same trick as the
    # encoder's window-reuse loop, r8 third pass), so every op slices
    # exactly the active lanes instead of masking all C; and since every
    # active lane consumes one token per iteration, the per-lane token
    # counter IS the loop index — it disappears.
    n_tok_i = np.maximum(ns - 1, 0)
    order = np.argsort(-n_tok_i, kind="stable")
    n_tok_s = n_tok_i[order]
    pos = base_bits.astype(np.uint64)[order]
    base_out_s = base_out[order]
    L = np.ones(C, dtype=np.uint64)      # window length; lanes never read it
    sh = np.zeros(C, dtype=np.uint64)    # before their first '11' token
    one = U64(1)
    A = int((n_tok_s > 0).sum())
    j = 0
    while A > 0:
        pa = pos[:A]
        w = _window(v64, b8, pa)
        c1 = (w >> U64(63)).astype(bool)
        c2 = ((w >> U64(62)) & one).astype(bool)
        is10 = c1 & ~c2
        is11 = c1 & c2
        if is11.any():
            hdr = (w << U64(2)) >> U64(52)
            newL = (hdr & U64(63)) + one
            newsh = U64(64) - (hdr >> U64(6)) - newL
            L[:A] = np.where(is11, newL, L[:A])
            sh[:A] = np.where(is11, newsh, sh[:A])
        if c1.any():
            o = pa + np.where(is11, U64(14), U64(2))
            w2 = _window(v64, b8, o)
            x = (w2 >> (U64(64) - L[:A])) << sh[:A]
            idx = base_out_s[:A] + 1 + j
            xs[idx[c1]] = x[c1]
        adv = np.where(~c1, one,
                       np.where(is10, U64(2) + L[:A], U64(14) + L[:A]))
        pos[:A] = pa + adv
        j += 1
        while A > 0 and n_tok_s[A - 1] <= j:
            A -= 1
    # segmented XOR prefix scan: xs[base]=0, firsts folded via correction
    acc = np.bitwise_xor.accumulate(xs)
    pre = np.where(base_out > 0, acc[np.maximum(base_out - 1, 0)], U64(0))
    return (acc ^ np.repeat(firsts ^ pre, ns)).view(np.float64)


def decode_ts_many(first_ts: np.ndarray, streams: list,
                   ns: np.ndarray) -> np.ndarray:
    """Decode many timestamp streams at once; flat int64 output in chunk
    order. Bit-identical to decode_ts per chunk (mod-2^64 arithmetic)."""
    C = len(streams)
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    base_out = np.concatenate(([0], np.cumsum(ns)))[:-1]
    firsts = np.ascontiguousarray(first_ts, dtype=np.int64).view(np.uint64)
    v64, b8, base_bits = _prep_windows(streams)
    dn = np.maximum(ns - 1, 0)
    deltas = np.zeros(int(dn.sum()), dtype=np.uint64)
    dbase = np.concatenate(([0], np.cumsum(dn)))[:-1]
    has_d = ns >= 2
    if has_d.any():
        # first delta: raw 64 bits at the (byte-aligned) stream start
        k0 = (base_bits[has_d] >> 3).astype(np.int64)
        deltas[dbase[has_d]] = v64[k0]
    # same sorted-prefix lockstep as decode_vals_many: active lanes are a
    # prefix of the count-descending order, the token counter is the loop
    # index, and every op runs on exactly the active slice.
    n_tok_i = np.maximum(ns - 2, 0)
    order = np.argsort(-n_tok_i, kind="stable")
    n_tok_s = n_tok_i[order]
    pos = base_bits.astype(np.uint64)[order] + U64(64)
    dbase_s = dbase[order]
    one = U64(1)
    A = int((n_tok_s > 0).sum())
    j = 0
    while A > 0:
        pa = pos[:A]
        w = _window(v64, b8, pa)
        c4 = w >> U64(60)
        is7 = (c4 >= U64(8)) & (c4 < U64(12))
        is9 = (c4 >= U64(12)) & (c4 < U64(14))
        is12 = c4 == U64(14)
        is64 = c4 == U64(15)
        d = np.zeros(A, dtype=np.uint64)
        if is7.any():
            p = (w << U64(2)) >> U64(57)
            d = np.where(is7, (p ^ U64(0x40)) - U64(0x40), d)
        if is9.any():
            p = (w << U64(3)) >> U64(55)
            d = np.where(is9, (p ^ U64(0x100)) - U64(0x100), d)
        if is12.any():
            p = (w << U64(4)) >> U64(52)
            d = np.where(is12, (p ^ U64(0x800)) - U64(0x800), d)
        if is64.any():
            w2 = _window(v64, b8, pa + U64(4))
            d = np.where(is64, w2, d)
        nz = c4 >= U64(8)
        if nz.any():
            idx = dbase_s[:A] + 1 + j
            deltas[idx[nz]] = d[nz]
        adv = np.where(c4 < U64(8), one,
              np.where(is7, U64(9),
              np.where(is9, U64(12),
              np.where(is12, U64(16), U64(68)))))
        pos[:A] = pa + adv
        j += 1
        while A > 0 and n_tok_s[A - 1] <= j:
            A -= 1
    # deltas hold [delta0, dod1, ...] per chunk: segmented cumsum -> true
    # deltas; a second segmented cumsum with firsts -> timestamps.
    if len(deltas):
        acc = np.cumsum(deltas, dtype=np.uint64)
        pre = np.where(dbase > 0, acc[np.maximum(dbase - 1, 0)], U64(0))
        deltas = acc - np.repeat(pre, dn)
    full = np.zeros(total, dtype=np.uint64)
    mask = np.ones(total, dtype=bool)
    mask[base_out] = False
    full[mask] = deltas
    acc = np.cumsum(full, dtype=np.uint64)
    pre = np.where(base_out > 0, acc[np.maximum(base_out - 1, 0)], U64(0))
    return (acc + np.repeat(firsts - pre, ns)).view(np.int64)


# ---------------------------------------------------------------- encode

def _insert_plan(ins: np.ndarray, n: int):
    """(inserted-slot positions, base-element mask) for inserting len(ins)
    elements into an n-element array at sorted original positions `ins` —
    the exact index arithmetic np.insert performs (sorted obj: out slot of
    insert j is ins[j]+j; duplicates keep given order), without np.insert's
    per-call mask rebuild for every array sharing the same positions."""
    m = len(ins)
    ipos = ins + np.arange(m)
    bmask = np.ones(n + m, dtype=bool)
    bmask[ipos] = False
    return ipos, bmask


def _insert_many(base: np.ndarray, ipos, bmask, vals) -> np.ndarray:
    out = np.empty(len(bmask), dtype=base.dtype)
    out[ipos] = vals
    out[bmask] = base
    return out


def _pack_pairs(vals, bits, lane_of_pair, C):
    """Pack lane-major (value, nbits<=64) pairs into per-lane byte streams,
    bit-identical to BitWriter (each lane zero-padded to a byte boundary).
    Zero-width pairs are allowed and must carry value 0."""
    lane_bits = np.bincount(lane_of_pair, weights=bits, minlength=C
                            ).astype(np.int64)
    pad = (-lane_bits) % 8
    ins = np.searchsorted(lane_of_pair, np.arange(C), side="right")
    ipos, bmask = _insert_plan(ins, len(vals))
    v = _insert_many(vals, ipos, bmask, np.zeros(C, dtype=np.uint64))
    nb = _insert_many(bits, ipos, bmask, pad)
    total = int(lane_bits.sum() + pad.sum())
    if total == 0:
        return [b""] * C
    off = np.concatenate(([0], np.cumsum(nb)[:-1]))
    # zero-width pairs only shape the offsets; drop them before the deposit
    # (one at the very end would otherwise index one word past the buffer)
    live = nb > 0
    v = v[live]
    nb = nb[live]
    off = off[live]
    q = off >> 6
    r = off & 63
    sh1 = 64 - r - nb
    A = np.where(sh1 >= 0,
                 v << np.clip(sh1, 0, 63).astype(np.uint64),
                 v >> np.clip(-sh1, 0, 63).astype(np.uint64))
    spill = sh1 < 0
    n_words = (total + 63) >> 6
    out = np.zeros(n_words, dtype=np.uint64)
    # q is nondecreasing (pairs are offset-ordered): one or-reduce per word;
    # bits of distinct pairs never overlap, so OR assembles them exactly.
    qb = np.flatnonzero(np.concatenate(([True], q[1:] != q[:-1])))
    out[q[qb]] = np.bitwise_or.reduceat(A, qb)
    if spill.any():
        Bv = v[spill] << (64 + np.clip(sh1[spill], -64, -1)).astype(np.uint64)
        qs = q[spill] + 1
        qsb = np.flatnonzero(np.concatenate(([True], qs[1:] != qs[:-1])))
        out[qs[qsb]] |= np.bitwise_or.reduceat(Bv, qsb)
    mv = out.astype(">u8").tobytes()
    byte_counts = (lane_bits + pad) >> 3
    ends = np.cumsum(byte_counts)
    starts = ends - byte_counts
    return [mv[s:e] for s, e in zip(starts.tolist(), ends.tolist())]


def _zero_gap_pairs(nzmask, tok_base, C):
    """For a lane-major flat token mask: per nonzero token, the run of zero
    tokens since the previous nonzero (or lane start); per lane, the
    trailing zero-run length. Mirrors the scalar encoders' batched zero
    writes exactly."""
    nz = np.flatnonzero(nzmask)
    lane_of_nz = np.searchsorted(tok_base, nz, side="right") - 1
    if len(nz):
        first_in_lane = np.concatenate(
            ([True], lane_of_nz[1:] != lane_of_nz[:-1]))
        prev = np.empty(len(nz), dtype=np.int64)
        prev[0] = -1
        prev[1:] = nz[:-1]
        gap = np.where(first_in_lane, nz - tok_base[lane_of_nz],
                       nz - prev - 1)
    else:
        gap = np.zeros(0, dtype=np.int64)
    tail = (tok_base[1:] - tok_base[:-1]).copy()
    if len(nz):
        last_in_lane = np.concatenate(
            (lane_of_nz[1:] != lane_of_nz[:-1], [True]))
        lz = lane_of_nz[last_in_lane]
        tail[lz] = tok_base[lz + 1] - 1 - nz[last_in_lane]
    return nz, gap, tail, lane_of_nz


def _assemble(pairAv, pairAb, pairBv, pairBb, gap, lane_of_nz,
              head_v, head_b, head_lane, tail, C):
    """Merge per-nz-token triples [(0,gap),(A),(B)] with per-lane head
    pairs (prepended) and per-lane trailing zero-run pairs (appended);
    everything lane-major."""
    n_nz = len(gap)
    trip_v = np.zeros(n_nz * 3, dtype=np.uint64)
    trip_b = np.empty(n_nz * 3, dtype=np.int64)
    trip_v[1::3] = pairAv
    trip_v[2::3] = pairBv
    trip_b[0::3] = gap
    trip_b[1::3] = pairAb
    trip_b[2::3] = pairBb
    trip_lane = np.repeat(lane_of_nz, 3)
    ins_tail = np.searchsorted(trip_lane, np.arange(C), side="right")
    ipos, bmask = _insert_plan(ins_tail, len(trip_v))
    v1 = _insert_many(trip_v, ipos, bmask, np.zeros(C, dtype=np.uint64))
    b1 = _insert_many(trip_b, ipos, bmask, tail)
    l1 = _insert_many(trip_lane, ipos, bmask, np.arange(C))
    if len(head_lane):
        ins_head = np.searchsorted(l1, head_lane, side="left")
        ipos, bmask = _insert_plan(ins_head, len(v1))
        v1 = _insert_many(v1, ipos, bmask, head_v)
        b1 = _insert_many(b1, ipos, bmask, head_b)
        l1 = _insert_many(l1, ipos, bmask, head_lane)
    return v1, b1, l1


def _lane_major_tokens(starts, ns, off):
    """(lane_rep, flat positions) of the lane-major token enumeration:
    token t of lane c sits at flat index starts[c] + t, t < ns[c] - off."""
    n_tok = np.maximum(ns - off, 0)
    tok_base = np.concatenate(([0], np.cumsum(n_tok)))
    nt = int(tok_base[-1])
    lane_rep = np.repeat(np.arange(len(starts)), n_tok)
    within = np.arange(nt) - tok_base[lane_rep]
    return tok_base, lane_rep, starts[lane_rep] + within


def encode_ts_many(ts_flat: np.ndarray, starts: np.ndarray) -> list:
    """Per-chunk ts_d2d streams for chunks given as segments of ts_flat;
    byte-identical to encode_ts per segment. Stateless classification —
    no iteration at all."""
    ts_flat = np.asarray(ts_flat, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.append(starts[1:], len(ts_flat))
    ns = ends - starts
    C = len(starts)
    if C == 0:
        return []
    d_flat = np.diff(ts_flat) if len(ts_flat) > 1 else np.zeros(0, np.int64)
    dod_flat = np.diff(d_flat) if len(d_flat) > 1 else np.zeros(0, np.int64)
    tok_base, _lr, fp = _lane_major_tokens(starts, ns, 2)
    d = dod_flat[fp] if len(fp) else np.zeros(0, np.int64)
    nz, gap, tail, lane_of_nz = _zero_gap_pairs(d != 0, tok_base, C)
    dnz = d[nz]
    du = dnz.astype(np.uint64)
    c7 = (dnz >= -64) & (dnz <= 63)
    c9 = ~c7 & (dnz >= -256) & (dnz <= 255)
    c12 = ~c7 & ~c9 & (dnz >= -2048) & (dnz <= 2047)
    c64 = ~c7 & ~c9 & ~c12
    vA = np.where(c7, (U64(2) << U64(7)) | (du & U64(0x7F)),
         np.where(c9, (U64(6) << U64(9)) | (du & U64(0x1FF)),
         np.where(c12, (U64(0xE) << U64(12)) | (du & U64(0xFFF)),
                  U64(0xF))))
    bA = np.where(c7, 9, np.where(c9, 12, np.where(c12, 16, 4)))
    vB = np.where(c64, du, U64(0))
    bB = np.where(c64, 64, 0)
    has_d = np.flatnonzero(ns >= 2)
    head_v = (d_flat[starts[has_d]].astype(np.uint64)
              if len(has_d) else np.zeros(0, np.uint64))
    head_b = np.full(len(has_d), 64, dtype=np.int64)
    v, b, lane = _assemble(vA, bA, vB, bB, gap, lane_of_nz,
                           head_v, head_b, has_d, tail, C)
    return _pack_pairs(v, b, lane, C)


def encode_vals_many(v_flat: np.ndarray, starts: np.ndarray) -> list:
    """Per-chunk vals_xor streams for chunks given as segments of v_flat;
    byte-identical to encode_vals per segment. Only the window-reuse
    decision locksteps (over nonzero XORs); everything else is one pass."""
    v_flat = np.asarray(v_flat, dtype=np.float64)
    bits64 = v_flat.view(np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.append(starts[1:], len(v_flat))
    ns = ends - starts
    C = len(starts)
    if C == 0:
        return []
    xflat = (bits64[:-1] ^ bits64[1:]) if len(bits64) > 1 else \
        np.zeros(0, np.uint64)
    tok_base, _lr, fp = _lane_major_tokens(starts, ns, 1)
    x_tok = xflat[fp] if len(fp) else np.zeros(0, np.uint64)
    nz, gap, tail, lane_of_nz = _zero_gap_pairs(x_tok != 0, tok_base, C)
    n_nz = len(nz)
    z0 = np.zeros(0, np.uint64)
    zi = np.zeros(0, np.int64)
    if n_nz == 0:
        v, b, lane = _assemble(z0, zi, z0, zi, zi, zi, z0, zi, zi, tail, C)
        return _pack_pairs(v, b, lane, C)
    x_nz = x_tok[nz]
    lead_nz, trail_nz = _lead_trail(x_nz)
    # lockstep the window-reuse state machine over the j-th nonzero token
    # of every lane at once
    nz_per_lane = np.bincount(lane_of_nz, minlength=C)
    nzbase = np.concatenate(([0], np.cumsum(nz_per_lane)))[:-1]
    maxJ = int(nz_per_lane.max())
    # lanes sorted by DESCENDING nz count: the active set at lockstep
    # iteration j is then a PREFIX of the sorted order, so each iteration
    # slices exactly the active lanes instead of masking all C — total
    # element-work O(total nz tokens) instead of O(C * maxJ) (real batches
    # measured 2-4x waste, r8 third pass). The per-lane state machine is
    # untouched: an inactive lane's state is simply never read or written,
    # which is exactly what the act mask guaranteed.
    order = np.argsort(-nz_per_lane, kind="stable")
    counts_s = nz_per_lane[order]
    nzbase_s = nzbase[order]
    prev_lead = np.full(C, 65, dtype=np.int64)   # state in sorted-lane order
    prev_len = np.zeros(C, dtype=np.int64)
    fits_all = np.zeros(n_nz, dtype=bool)
    A = int((counts_s > 0).sum())
    for j in range(maxJ):
        while A > 0 and counts_s[A - 1] <= j:
            A -= 1
        ii = nzbase_s[:A] + j
        lead = lead_nz[ii]
        trail = trail_nz[ii]
        pl = prev_lead[:A]
        pn = prev_len[:A]
        fits = (pl <= lead) & ((64 - pl - pn) <= trail)
        renew = ~fits
        prev_lead[:A] = np.where(renew, lead, pl)
        prev_len[:A] = np.where(renew, 64 - lead - trail, pn)
        fits_all[ii] = fits
    fits = fits_all
    # window in effect at each nz token = most recent RENEW row's (lead,
    # len) within the lane; the lane's first nz token always renews, so a
    # within-lane forward fill (running max of renew positions, offset by
    # a per-lane key so lanes never bleed) resolves every token's window.
    idx = np.arange(n_nz)
    jwithin = idx - nzbase[lane_of_nz]
    seg = np.where(~fits, jwithin, 0)
    lane_start = np.concatenate(([True], lane_of_nz[1:] != lane_of_nz[:-1]))
    grp = np.cumsum(lane_start) - 1
    ff = np.maximum.accumulate((grp.astype(np.int64) << 32) + seg)
    src = nzbase[lane_of_nz] + (ff & 0xFFFFFFFF)
    win_lead = lead_nz[src]
    win_len = (64 - lead_nz - trail_nz)[src]
    sh = np.clip(64 - win_lead - win_len, 0, 63).astype(np.uint64)
    payload = x_nz >> sh
    tot_bits = np.where(fits, 2 + win_len, 14 + win_len)
    ctrl = np.where(
        fits, U64(2),
        (U64(3) << U64(12)) | (win_lead.astype(np.uint64) << U64(6))
        | (win_len - 1).astype(np.uint64))
    ctrl_bits = np.where(fits, 2, 14)
    fused = tot_bits <= 64
    vA = np.where(fused,
                  (ctrl << np.minimum(win_len, 62).astype(np.uint64))
                  | payload,
                  ctrl)
    bA = np.where(fused, tot_bits, ctrl_bits)
    vB = np.where(fused, U64(0), payload)
    bB = np.where(fused, 0, win_len)
    v, b, lane = _assemble(vA, bA, vB, bB, gap, lane_of_nz,
                           z0, zi, zi, tail, C)
    return _pack_pairs(v, b, lane, C)
