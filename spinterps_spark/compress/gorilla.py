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
    D in [-64, 63]      -> '10'  + 7-bit two's complement
    D in [-256, 255]    -> '110' + 9-bit
    D in [-2048, 2047]  -> '1110'+ 12-bit
    else                -> '1111'+ 64-bit raw
(Ranges are symmetric with the two's-complement payload — NOT the paper's
offset-coded [-63,64] windows — so encode/decode are exact inverses for any
int64 input, including the boundary values 64/256/2048.)
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


class VecWriter:
    """Drop-in BitWriter replacement that DEFERS packing: write() only
    appends (value, nbits) parts (>64-bit writes split MSB-first into
    64-bit limbs), and bytes() emits the whole stream with one vectorized
    numpy pass (repeat/cumsum bit expansion + packbits, MSB-first — the
    exact BitWriter bit order, asserted identical in test_gorilla)."""

    __slots__ = ("vals", "bits")

    def __init__(self):
        self.vals: list[int] = []
        self.bits: list[int] = []

    def write(self, value: int, nbits: int):
        value &= (1 << nbits) - 1
        while nbits > 64:
            self.vals.append(value >> (nbits - 64))
            self.bits.append(64)
            nbits -= 64
            value &= (1 << nbits) - 1
        self.vals.append(value)
        self.bits.append(nbits)

    def bytes(self) -> bytes:
        if not self.vals:
            return b""
        n_arr = np.asarray(self.bits, dtype=np.int64)
        v_arr = np.asarray(self.vals, dtype=np.uint64)
        total = int(n_arr.sum())
        pad = (-total) % 8
        if pad:
            n_arr = np.append(n_arr, pad)
            v_arr = np.append(v_arr, np.uint64(0))
            total += pad
        pid = np.repeat(np.arange(len(n_arr)), n_arr)
        off = np.concatenate(([0], np.cumsum(n_arr)[:-1]))
        k = np.arange(total) - off[pid]
        shift = (n_arr[pid] - 1 - k).astype(np.uint64)
        out_bits = ((v_arr[pid] >> shift) & np.uint64(1)).astype(np.uint8)
        return np.packbits(out_bits).tobytes()


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


def encode_ts(ts: np.ndarray) -> bytes:
    """ts: int64 seconds, ascending. Stream excludes ts[0] (stored raw in the
    struct); includes the first delta as a raw 64-bit field.

    Classification of delta-of-deltas is vectorized (np.select); the loop
    only emits precomputed (prefix, payload) pairs; packing is the
    vectorized VecWriter (BitWriter kept as the bit-exact reference
    implementation, equality-tested)."""
    ts = np.asarray(ts, dtype=np.int64)
    w = VecWriter()
    if len(ts) < 2:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dods = np.diff(deltas)
    if len(dods) == 0:
        return w.bytes()
    # one fused (prefix|payload) write per nonzero dod; zero runs batched
    # into a single multi-bit write (the dominant case on steady cadences).
    write = w.write
    nz_idx = np.flatnonzero(dods != 0)
    dod_list = dods.tolist()
    prev = -1
    for i in nz_idx.tolist():
        gap = i - prev - 1
        if gap:
            write(0, gap)
        d = dod_list[i]
        if -64 <= d <= 63:
            write((0b10 << 7) | (d & 0x7F), 9)
        elif -256 <= d <= 255:
            write((0b110 << 9) | (d & 0x1FF), 12)
        elif -2048 <= d <= 2047:
            write((0b1110 << 12) | (d & 0xFFF), 16)
        else:
            write((0b1111 << 64) | (d & ((1 << 64) - 1)), 68)
        prev = i
    tail = len(dod_list) - prev - 1
    if tail:
        write(0, tail)
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
    """vals: float64. Stream excludes vals[0] (stored raw in the struct).

    XOR chain + leading/trailing-zero counts are vectorized with numpy
    (unpackbits over the big-endian byte view); the loop only applies the
    window-control state machine and emits bits."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    w = VecWriter()
    if len(bits) < 2:
        return w.bytes()
    xors = bits[:-1] ^ bits[1:]
    bitmat = np.unpackbits(
        xors.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )
    nz = xors != 0
    # bitmat column 0 is bit 63 (big-endian): leading zeros = first set
    # column; trailing zeros = first set column of the reversed matrix.
    lead_arr = np.where(nz, bitmat.argmax(axis=1), 64)
    trail_arr = np.where(nz, bitmat[:, ::-1].argmax(axis=1), 64)
    lead_arr = np.minimum(lead_arr, 63)

    x_list = xors.tolist()
    lead_list = lead_arr.tolist()
    trail_list = trail_arr.tolist()
    prev_lead, prev_len = 65, 0  # invalid window -> first xor re-windows
    write = w.write
    # fused single-write per nonzero xor; zero runs batched into one write
    nz_idx = np.flatnonzero(xors != 0)
    prev_i = -1
    for i in nz_idx.tolist():
        gap = i - prev_i - 1
        if gap:
            write(0, gap)
        x = x_list[i]
        lead = lead_list[i]
        trail = trail_list[i]
        length = 64 - lead - trail
        if prev_lead <= lead and (64 - prev_lead - prev_len) <= trail:
            # '1' control + '0' window-reuse + payload, one write
            write((0b10 << prev_len) | (x >> (64 - prev_lead - prev_len)),
                  prev_len + 2)
        else:
            # '1' + '1' + 6-bit lead + 6-bit (len-1) + payload, one write
            write(
                (((0b11 << 6 | lead) << 6 | (length - 1)) << length)
                | (x >> trail),
                14 + length,
            )
            prev_lead, prev_len = lead, length
        prev_i = i
    tail = len(x_list) - prev_i - 1
    if tail:
        write(0, tail)
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

# chunk_size is the ENCODE-TIME points-per-chunk setting, stamped per row so
# the pruning span can be derived from the table itself instead of a caller
# claim (metadata travels with the data — reference stamps every run setting
# into the cube as attributes, interp/prepare.py:387-428; VERDICT r5 #1).
CHUNK_SCHEMA = (
    "conv_id string, tier string, chunk_start_ts timestamp, n int, "
    "first_ts long, first_val double, ts_d2d binary, vals_xor binary, "
    "chunk_size int"
)


def encode_tier_chunks(filled: DataFrame_or_any, tier: str, value_col: str = "value_filled",
                       chunk_size: int = DEFAULT_CHUNK):
    """(conv_id, bucket_ts, value) -> Gorilla chunk structs.

    Chunk key = (conv_id, floor(epoch / (chunk_size * tier_seconds))):
    time-aligned fixed windows, so chunk membership is a pure function of
    the row (deterministic across runs, resumable, and bounded at
    chunk_size points for a dense filled series — no conversation-sized
    group ever materializes). Executed via the stitched mapInPandas path
    (operators/grouped.py): one Python call per Arrow batch.
    """
    from pyspark.sql import functions as F

    from spinterps_spark import TIER_SECONDS
    from spinterps_spark.operators.grouped import apply_grouped_batches, group_bounds

    span = chunk_size * TIER_SECONDS[tier]
    df = filled.select(
        "conv_id",
        F.unix_timestamp("bucket_ts").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
        (F.unix_timestamp("bucket_ts") / span).cast("long").alias("_ck"),
    )

    def to_chunks(pdf: pd.DataFrame) -> pd.DataFrame:
        from spinterps_spark.compress.gorilla_vec import (
            encode_ts_many, encode_vals_many,
        )

        starts = group_bounds(pdf, ["conv_id", "_ck"])
        t_all = pdf["_t"].to_numpy(np.int64)
        v_all = pdf["_v"].to_numpy(np.float64)
        conv_all = pdf["conv_id"].to_numpy()
        ns = np.diff(np.append(starts, len(pdf)))
        first_ts = t_all[starts] if len(pdf) else np.zeros(0, np.int64)
        out = pd.DataFrame({
            "conv_id": conv_all[starts] if len(pdf) else conv_all,
            "n": ns.astype(np.int32),
            "first_ts": first_ts,
            "first_val": (v_all[starts] if len(pdf)
                          else np.zeros(0, np.float64)),
            "ts_d2d": encode_ts_many(t_all, starts),
            "vals_xor": encode_vals_many(v_all, starts),
        })
        out.insert(1, "tier", tier)
        out.insert(2, "chunk_start_ts", pd.to_datetime(first_ts, unit="s"))
        out["chunk_size"] = np.int32(chunk_size)
        return out[["conv_id", "tier", "chunk_start_ts", "n",
                    "first_ts", "first_val", "ts_d2d", "vals_xor",
                    "chunk_size"]]

    return apply_grouped_batches(df, ["conv_id", "_ck"], "_t", to_chunks, CHUNK_SCHEMA)


def decode_tier_chunks(chunks):
    """Inverse of encode_tier_chunks via mapInPandas (verification read).
    Every chunk of an Arrow batch is decoded in ONE lockstep pass
    (compress/gorilla_vec.py) — no per-chunk Python, no per-point Python;
    the decoded flat arrays are emitted as one frame per batch.
    A multi-metric chunk table (the fused pass's extra_value_cols output)
    carries a `metric` column; it is repeated per point like conv_id."""
    from spinterps_spark.compress.gorilla_vec import (
        decode_ts_many, decode_vals_many,
    )

    has_metric = "metric" in chunks.columns

    def expand(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ns = pdf["n"].to_numpy(np.int64)
            ts = decode_ts_many(
                pdf["first_ts"].to_numpy(np.int64), list(pdf["ts_d2d"]), ns)
            vals = decode_vals_many(
                pdf["first_val"].to_numpy(np.float64),
                list(pdf["vals_xor"]), ns)
            # label columns go out dictionary-encoded: repeating integer
            # codes and letting Arrow carry a per-batch dictionary is ~2.4x
            # cheaper at the Arrow boundary than materializing per-point
            # python strings (r8); Spark reads a dictionary<string> column
            # as the declared string type, values identical
            rep = np.repeat(np.arange(len(pdf)), ns)

            def dic(col):
                codes, uniq = pd.factorize(pdf[col])
                return pd.Categorical.from_codes(codes[rep], categories=uniq)

            out = {
                "conv_id": dic("conv_id"),
                "tier": dic("tier"),
                "bucket_ts": pd.to_datetime(ts, unit="s"),
                "value": vals,
            }
            if has_metric:
                out["metric"] = dic("metric")
            yield pd.DataFrame(out)

    schema = "conv_id string, tier string, bucket_ts timestamp, value double"
    if has_metric:
        schema += ", metric string"
    return chunks.mapInPandas(expand, schema=schema)


# typing alias kept loose to avoid importing pyspark at module import in
# numpy-only contexts (the oracle imports encode/decode functions directly).
DataFrame_or_any = object


def read_chunks_pruned(
    spark,
    source,
    tier: str,
    conv_ids: list[str] | None = None,
    t_min=None,
    t_max=None,
    chunk_size_bound: int | None = None,
):
    """S3/S4 analog — selective cube read with coordinate/time selection.

    The reference's netCDF sources open a gridded cube and gather values
    at selected station indices / time slices (extract/nc.py:408-951:
    coordinate selection before the read materializes anything). The
    chunk-struct table is the engine's cube: this read pushes BOTH
    selections below the decode —

    - conv_ids: an IN filter on the conv_id column (partition/row-group
      pruning on a sorted or partitioned chunk table);
    - [t_min, t_max]: chunk membership is a pure function of the row
      (chunk key = floor(epoch / span), span = chunk_size x tier seconds,
      so every point of a chunk lives in [k*span, (k+1)*span)). The range
      filter therefore lands on chunk_start_ts — a plain comparison
      parquet row-group stats can serve (PushedFilters, asserted in
      pytest) — and only surviving chunks are ever DECODED.

    The pruning span is derived from the table's own `chunk_size` column
    (stamped per row at encode time — metadata travels with the data,
    reference interp/prepare.py:387-428), NOT from a caller claim: r5's
    claim-based API silently over-pruned when the claim was too small and
    every chunk happened to be underfilled (ADVICE r5 #1). A table whose
    tiers were appended under DIFFERENT encode settings is still read
    correctly: the largest chunk_size gives the loosest (safe, superset)
    lower bound, and the exact post-decode trim drops the slack again.

    Points are trimmed to the exact [t_min, t_max] bounds after decode
    (a chunk straddling the edge contributes only its in-range points).
    """
    from pyspark.sql import functions as F

    from spinterps_spark import TIER_SECONDS

    # source: a parquet path/glob, or an already-built chunk DataFrame
    # (e.g. the merged multi-generation view from plans/generations —
    # the filters below still push through its unions to the scans).
    # The chunk table may hold several tiers (CHUNK_SCHEMA carries tier);
    # span-based pruning is only valid for the requested one.
    chunks = (
        spark.read.parquet(source) if isinstance(source, str) else source
    ).where(F.col("tier") == tier)
    if conv_ids is not None:
        chunks = chunks.where(F.col("conv_id").isin(*conv_ids))
    if t_min is not None:
        if "chunk_size" not in chunks.columns:
            raise ValueError(
                "read_chunks_pruned: chunk table lacks the chunk_size "
                "column (written by a pre-r6 encoder?) — re-encode, or "
                "decode unpruned via decode_tier_chunks"
            )
        if chunk_size_bound is not None:
            # metadata-derived bound (plans/generations.tier_chunk_size_bound
            # — stamped by the commits that published the rows, NOT a caller
            # claim): skips the eager per-read aggregate the router used to
            # pay once per tier leg (ADVICE r6 #5). A loose bound only
            # loosens the pushable lower bound (safe superset); the exact
            # post-decode trim is unchanged.
            enc_size = int(chunk_size_bound)
        else:
            # one columnar-scan aggregate over a single int column (parquet
            # reads only tier + chunk_size); max() is the conservative span
            # when rows were appended under mixed encode settings.
            enc_size = chunks.agg(F.max("chunk_size")).first()[0]
            if enc_size is None:
                # no chunks survive the tier/conv filters — nothing to prune
                enc_size = DEFAULT_CHUNK
        span = int(enc_size) * TIER_SECONDS[tier]
        # chunk keys come from (epoch/span).cast('long'), which truncates
        # toward zero — around epoch 0 a chunk window can be (-span, span),
        # i.e. up to 2*span wide. One extra span of slack below the floor
        # bound keeps the scan filter correct for ANY epoch sign; the
        # exact >= t_min trim below drops the slack's points again.
        lo = (int(t_min) // span) * span - span
        chunks = chunks.where(F.col("chunk_start_ts") >= F.timestamp_seconds(F.lit(lo)))
    if t_max is not None:
        chunks = chunks.where(
            F.col("chunk_start_ts") <= F.timestamp_seconds(F.lit(int(t_max)))
        )
    out = decode_tier_chunks(chunks)
    if t_min is not None:
        out = out.where(F.unix_timestamp("bucket_ts") >= int(t_min))
    if t_max is not None:
        out = out.where(F.unix_timestamp("bucket_ts") <= int(t_max))
    return out
