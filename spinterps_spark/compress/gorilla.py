"""Gorilla chunk compression (K8): delta-of-delta timestamps + XOR floats.

Public-knowledge algorithm (Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015). The reference engine compresses
its output cube with zlib-chunked netCDF (interp/prepare.py:360-372); the
graft stores rolled-up points as fixed-size Gorilla chunk structs per
(conv_id, tier, chunk) instead:

    (conv_id, tier, chunk_start_ts, n, first_ts, first_val,
     ts_d2d binary, vals_xor binary)

Timestamp stream: first_ts raw; first delta 64-bit raw; then delta-of-delta D:
    D == 0              -> '0'
    D in [-63, 64]      -> '10'  + 7-bit two's complement
    D in [-255, 256]    -> '110' + 9-bit
    D in [-2047, 2048]  -> '1110'+ 12-bit
    else                -> '1111'+ 64-bit raw
(64-bit escape instead of the paper's 32 — retention-tier gaps can exceed 2^31 s.)

Value stream: first_val raw 64-bit IEEE754; then XOR with previous value:
    xor == 0 -> '0'
    else '1' then:
      meaningful block fits previous (leading, length) window ->
          '0' + length bits
      else '1' + 6-bit leading-zero count + 6-bit (length-1) + length bits

Encode/decode are exact bit-for-bit inverses for any float64 payload
(including NaN payloads). Chunks are bounded (default 120 points, the
Gorilla paper's 2h@1m block), so the per-chunk Python loop is O(chunk) and
amortized across Arrow batches inside applyInPandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_CHUNK = 120


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def _twos(value: int, bits: int) -> int:
    return value & ((1 << bits) - 1)


def _untwos(raw: int, bits: int) -> int:
    if raw & (1 << (bits - 1)):
        return raw - (1 << bits)
    return raw


_DOD_PLAN = ((-63, 64, 0b10, 2, 7), (-255, 256, 0b110, 3, 9), (-2047, 2048, 0b1110, 4, 12))


def encode_ts(ts: np.ndarray) -> bytes:
    """ts: int64 seconds, ascending. Stream excludes ts[0] (stored raw in the
    struct); includes the first delta as a raw 64-bit field."""
    ts = np.asarray(ts, dtype=np.int64)
    w = BitWriter()
    if len(ts) < 2:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dods = np.diff(deltas)
    for d in dods:
        d = int(d)
        if d == 0:
            w.write(0, 1)
            continue
        for lo, hi, prefix, pbits, vbits in _DOD_PLAN:
            if lo <= d <= hi:
                w.write(prefix, pbits)
                w.write(_twos(d, vbits), vbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(_twos(d, 64), 64)
    return w.bytes()


def decode_ts(first_ts: int, data: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = first_ts
    if n == 1:
        return out
    r = BitReader(data)
    delta = _untwos(r.read(64), 64)
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = _untwos(r.read(7), 7)
        elif r.read(1) == 0:
            dod = _untwos(r.read(9), 9)
        elif r.read(1) == 0:
            dod = _untwos(r.read(12), 12)
        else:
            dod = _untwos(r.read(64), 64)
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def _leading_zeros64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _trailing_zeros64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def encode_vals(vals: np.ndarray) -> bytes:
    """vals: float64. Stream excludes vals[0] (stored raw in the struct)."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = BitWriter()
    prev = int(bits[0])
    prev_lead, prev_len = 65, 0  # invalid window -> first xor always re-windows
    for cur in bits[1:]:
        cur = int(cur)
        x = cur ^ prev
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        w.write(1, 1)
        lead = min(_leading_zeros64(x), 63)
        trail = _trailing_zeros64(x)
        length = 64 - lead - trail
        if prev_lead <= lead and (64 - prev_lead - prev_len) <= trail:
            # fits the previous window
            w.write(0, 1)
            w.write(x >> (64 - prev_lead - prev_len), prev_len)
        else:
            w.write(1, 1)
            w.write(lead, 6)
            w.write(length - 1, 6)
            w.write(x >> trail, length)
            prev_lead, prev_len = lead, length
    return w.bytes()


def decode_vals(first_val: float, data: bytes, n: int) -> np.ndarray:
    out_bits = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out_bits.view(np.float64)
    prev = int(np.float64(first_val).view(np.uint64))
    out_bits[0] = prev
    r = BitReader(data)
    lead, length = 65, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out_bits[i] = prev
            continue
        if r.read(1) == 1:
            lead = r.read(6)
            length = r.read(6) + 1
        x = r.read(length) << (64 - lead - length)
        prev ^= x
        out_bits[i] = prev
    return out_bits.view(np.float64)


def encode_chunk(ts: np.ndarray, vals: np.ndarray) -> dict:
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    assert len(ts) == len(vals) and len(ts) > 0
    return {
        "n": len(ts),
        "first_ts": int(ts[0]),
        "first_val": float(vals[0]),
        "ts_d2d": encode_ts(ts),
        "vals_xor": encode_vals(vals),
    }


def decode_chunk(chunk: dict) -> tuple[np.ndarray, np.ndarray]:
    n = int(chunk["n"])
    ts = decode_ts(int(chunk["first_ts"]), chunk["ts_d2d"], n)
    vals = decode_vals(float(chunk["first_val"]), chunk["vals_xor"], n)
    return ts, vals


# ---------------------------------------------------------------- Spark ops

CHUNK_SCHEMA = (
    "conv_id string, tier string, chunk_start_ts timestamp, n int, "
    "first_ts long, first_val double, ts_d2d binary, vals_xor binary"
)


def encode_tier_chunks(filled: DataFrame_or_any, tier: str, value_col: str = "value_filled",
                       chunk_size: int = DEFAULT_CHUNK):
    """(conv_id, bucket_ts, value) -> Gorilla chunk structs, one group per
    conversation, chunks of `chunk_size` points in bucket_ts order."""

    def to_chunks(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts", kind="mergesort")
        t = (pdf["bucket_ts"].astype("int64") // 10**9).to_numpy()
        v = pdf[value_col].to_numpy(np.float64)
        conv = pdf["conv_id"].iloc[0]
        rows = []
        for s in range(0, len(t), chunk_size):
            c = encode_chunk(t[s : s + chunk_size], v[s : s + chunk_size])
            rows.append(
                (
                    conv,
                    tier,
                    pd.Timestamp(c["first_ts"], unit="s"),
                    c["n"],
                    c["first_ts"],
                    c["first_val"],
                    c["ts_d2d"],
                    c["vals_xor"],
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "tier", "chunk_start_ts", "n",
                "first_ts", "first_val", "ts_d2d", "vals_xor",
            ],
        )

    return filled.groupBy("conv_id").applyInPandas(to_chunks, schema=CHUNK_SCHEMA)


def decode_tier_chunks(chunks):
    """Inverse of encode_tier_chunks via mapInPandas (verification read)."""

    def expand(batches):
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                ts, vals = decode_chunk(
                    {
                        "n": row.n,
                        "first_ts": row.first_ts,
                        "first_val": row.first_val,
                        "ts_d2d": row.ts_d2d,
                        "vals_xor": row.vals_xor,
                    }
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": row.conv_id,
                            "tier": row.tier,
                            "bucket_ts": pd.to_datetime(ts, unit="s"),
                            "value": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return chunks.mapInPandas(
        expand, schema="conv_id string, tier string, bucket_ts timestamp, value double"
    )


# typing alias kept loose to avoid importing pyspark at module import in
# numpy-only contexts (the oracle imports encode/decode functions directly).
DataFrame_or_any = object
