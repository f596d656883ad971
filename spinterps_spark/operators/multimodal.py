"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are treated as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over mapInPandas.

Decode status (r3): ALL THREE modalities decode for REAL with pure-stdlib
parsers of public formats — no codec libs needed, no stub boundary left:
  - audio: RIFF/WAVE PCM16 (decode_wav, struct chunk walk);
  - image: BMP BITMAPINFOHEADER 24-bit BI_RGB (decode_bmp, incl. row
    stride padding and top-down negative-height bitmaps);
  - video: YUV4MPEG2 / .y4m mono (decode_y4m, plain-text header + FRAME
    markers — the mjpegtools public stream format).
Features are derived from exact integer aggregates (sums/min/max over
pixel/sample ints, one final float op), so the DuckDB oracle twin decodes
the same payload bytes from hex() and reproduces every feature
bit-for-bit — the decode itself is value-checked, not just the plumbing.

Scale notes: payloads never pass through Python row-by-row (Arrow batches),
batch memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch,
and media tables should be read with small files coalesced
(spark.sql.files.maxPartitionBytes) since payload rows are wide.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes long, digest string"


WAV_SAMPLE_RATE = 16000


def synth_wav(samples: np.ndarray, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Minimal canonical RIFF/WAVE writer: PCM16 mono, 44-byte header +
    little-endian int16 data (the public WAVE format spec; parity-checked
    against the stdlib `wave` writer in tests)."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL audio decode, pure stdlib: walk RIFF chunks to 'fmt '/'data',
    require PCM16 mono, return (int16 samples, sample_rate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or n_channels != 1 or bits != 16:
        raise ValueError(f"only PCM16 mono supported, got {fmt}")
    return np.frombuffer(data, dtype="<i2"), int(sample_rate)


def synth_bmp(px: np.ndarray) -> bytes:
    """Minimal canonical BMP writer: BITMAPFILEHEADER + 40-byte
    BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up BGR rows padded to 4-byte
    stride (the public Windows DIB format). px is (h, w, 3) uint8 RGB."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up
        row = px[r][:, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(rows)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return hdr + dib + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decode, pure stdlib: parse the BMP file + info headers,
    require 24-bit uncompressed BI_RGB, un-pad the 4-byte row stride, and
    return (h, w, 3) uint8 RGB. Handles both bottom-up (positive height)
    and top-down (negative height) bitmaps."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_sig, _fsize, _r1, _r2, data_off) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_size, w, h_signed, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported, got hdr={hdr_size} planes={planes} "
            f"bpp={bpp} compression={compression}"
        )
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # bottom-up -> top-down
    return rows[:, :, ::-1].copy()  # BGR -> RGB


Y4M_MAGIC = b"YUV4MPEG2"


def synth_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Minimal canonical YUV4MPEG2 writer: plain-text stream header with
    W/H/F/C tokens, then 'FRAME\\n' + raw luma bytes per frame (Cmono =
    8-bit greyscale, the mjpegtools public .y4m format). frames is
    (n, h, w) uint8."""
    n, h, w = frames.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    out = [hdr]
    for f in np.asarray(frames, dtype=np.uint8):
        out.append(b"FRAME\n" + f.tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL video decode, pure stdlib: parse the YUV4MPEG2 header tokens
    (require Cmono), walk FRAME markers (frame-level parameters after
    'FRAME' are allowed per spec), return ((n, h, w) uint8 luma, fps)."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(Y4M_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = fps = None
    colorspace = "C420"  # spec default when no C token
    for tok in payload[len(Y4M_MAGIC) + 1 : nl].decode("ascii").split():
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, _, den = tok[1:].partition(":")
            # rational frame rates (e.g. F30000:1001 = NTSC 29.97) round
            # to the nearest integer — the numerator alone would be 1000x
            fps = round(int(num) / int(den or 1))
        elif tok[0] == "C":
            colorspace = tok
    if w is None or h is None:
        raise ValueError("missing W/H header tokens")
    if colorspace != "Cmono":
        raise ValueError(f"only Cmono supported, got {colorspace}")
    fsz = w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or len(payload) < fnl + 1 + fsz:
            raise ValueError("truncated frame")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=fsz, offset=fnl + 1)
            .reshape(h, w)
        )
        pos = fnl + 1 + fsz
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), int(fps or 0)


def media_rows(n: int = 64, seed: int = 5) -> list[tuple]:
    """Deterministic media rows (shared by synth_media and the fixture
    parquet writer so the Spark query and the DuckDB oracle see identical
    bytes). v3: every payload is a REAL public container — RIFF/WAVE PCM16
    audio, 24-bit BI_RGB BMP images, YUV4MPEG2 Cmono video. Fixture image
    widths are multiples of 4 (zero stride padding) so the hex-decoding
    SQL twin reads the pixel region directly; the decoder itself handles
    padded strides too (pytest covers odd widths)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "audio":
            n_samples = 64 + (i * 37) % 256
            samples = rng.randint(-(2**15), 2**15, n_samples).astype(np.int16)
            payload = synth_wav(samples)
            meta = (0, 0, n_samples, WAV_SAMPLE_RATE)
        elif kind == "image":
            w, h = 8 + 4 * (i % 12), 6 + i % 7
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            payload = synth_bmp(px)
            meta = (w, h, 1, 0)
        else:
            w, h, nf = 16 + 4 * (i % 9), 12, 1 + i % 8
            frames = rng.randint(0, 256, (nf, h, w)).astype(np.uint8)
            payload = synth_y4m(frames)
            meta = (w, h, nf, 0)
        rows.append((i, kind, payload, meta))
    return rows


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rows = [(i, k, bytearray(p), m) for i, k, p, m in media_rows(n, seed)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _image_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """REAL image feature extraction over decoded BMP pixels: per-channel
    means and global min/max from exact integer aggregates (one final float
    div each), channel aggregates are row-order-insensitive so the SQL twin
    needn't replay the bottom-up row flip.

    Layout: [width, height, mean_r, mean_g, mean_b, px_min, px_max, 0...]."""
    px = decode_bmp(payload)
    h, w, _ = px.shape
    n = w * h
    a = px.astype(np.int64)
    feats = [
        float(w), float(h),
        int(a[:, :, 0].sum()) / n,
        int(a[:, :, 1].sum()) / n,
        int(a[:, :, 2].sum()) / n,
        float(int(a.min())),
        float(int(a.max())),
    ]
    feats += [0.0] * max(0, dim - len(feats))
    return np.array(feats[:dim], dtype=np.float32)


def _video_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """REAL video feature extraction over decoded Y4M luma planes: exact
    integer aggregates over all frames plus the first frame.

    Layout: [width, height, n_frames, luma_mean, luma_min, luma_max,
    f0_mean, 0...]."""
    frames, _fps = decode_y4m(payload)
    nf, h, w = frames.shape
    a = frames.astype(np.int64)
    feats = [
        float(w), float(h), float(nf),
        int(a.sum()) / (nf * h * w) if nf else 0.0,
        float(int(a.min())) if nf else 0.0,
        float(int(a.max())) if nf else 0.0,
        int(a[0].sum()) / (h * w) if nf else 0.0,
    ]
    feats += [0.0] * max(0, dim - len(feats))
    return np.array(feats[:dim], dtype=np.float32)


def _audio_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """REAL audio feature extraction over decoded PCM16: every feature is
    derived from exact integer aggregates (sums, counts, peaks) with one
    final float op, so a SQL oracle reproduces them bit-for-bit — no
    cross-engine float-reduction drift.

    Layout: [n_samples, sample_rate, mean_amp, rms, zero_cross_rate, peak,
    duration_sec, 0...]."""
    s, sr = decode_wav(payload)
    n = len(s)
    a = s.astype(np.int64)
    sum_amp = int(a.sum())
    sum_sq = int((a * a).sum())
    zc = int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if n > 1 else 0
    peak = int(np.abs(a).max()) if n else 0
    feats = [
        float(n), float(sr),
        sum_amp / n if n else 0.0,
        float(np.sqrt(sum_sq / n)) if n else 0.0,   # sqrt is IEEE-exact
        zc / (n - 1) if n > 1 else 0.0,
        float(peak),
        n / sr,
    ]
    feats += [0.0] * max(0, dim - len(feats))
    return np.array(feats[:dim], dtype=np.float32)


_FEATURE_FNS = {
    "audio": _audio_features,
    "image": _image_features,
    "video": _video_features,
}


def extract_features(media: DataFrame, dim: int = 8, strict: bool = True) -> DataFrame:
    """Binary payload -> feature vector via mapInPandas (Arrow batches).

    Every known kind decodes for REAL (WAV / BMP / Y4M, pure stdlib).
    Unknown kinds raise NotImplementedError under strict (default) or get
    an all-zero feature vector with strict=False."""

    def run(batches):
        for pdf in batches:
            feats = []
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                fn = _FEATURE_FNS.get(kind)
                if fn is not None:
                    feats.append(fn(bytes(p), dim).tolist())
                elif strict:
                    raise NotImplementedError(f"no decoder for kind={kind!r}")
                else:
                    feats.append([0.0] * dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Video frame sampling: REAL Y4M decode, one row per sampled luma
    plane with its md5 digest (so downstream exact frame-dedup is a plain
    groupBy on digest). The digest is md5 over the frame's lowercase hex
    encoding — injective in the frame bytes and reproducible by a SQL
    engine whose md5 only takes text (DuckDB), so the driver oracle can
    re-derive it from hex(payload) substrings."""
    import hashlib

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": [], "digest": []}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                frames, _fps = decode_y4m(bytes(payload))
                for fi in range(0, len(frames), every_nth):
                    fb = frames[fi].tobytes()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_bytes"].append(len(fb))
                    out["digest"].append(
                        hashlib.md5(fb.hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_meta(media: DataFrame, max_w: int = 32) -> DataFrame:
    """Resize planning is pure metadata math -> stays JVM-side entirely.
    Non-visual rows (width 0, e.g. audio) get NULL resize columns."""
    w = F.col("meta.width")
    scale = F.least(F.lit(1.0), F.lit(max_w) / F.nullif(w, F.lit(0)))
    visual = w > 0
    return media.select(
        "media_id", "kind",
        w.alias("width"),
        F.col("meta.height").alias("height"),
        F.when(visual, F.round(w * scale)).cast("int").alias("new_width"),
        F.when(visual, F.round(F.col("meta.height") * scale)).cast("int")
        .alias("new_height"),
    )
