"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are treated as `binary` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over mapInPandas. The codec libraries (PIL/ffmpeg/...)
are not in this sandbox, so the *decode kernels* are stubbed: a
deterministic fake decoder by default (schema-true outputs, testable
plumbing) or NotImplementedError when strict=True. The Spark-side contract
— schema, partition sizing, UDF signature, Arrow batch shape — is real.

Scale notes: payloads never pass through Python row-by-row (Arrow batches),
batch memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch,
and media tables should be read with small files coalesced
(spark.sql.files.maxPartitionBytes) since payload rows are wide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes long, digest string"


def media_rows(n: int = 64, seed: int = 5) -> list[tuple]:
    """Deterministic fake media rows (shared by synth_media and the fixture
    parquet writer so the Spark query and the DuckDB oracle see identical
    bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(128 + (i * 37) % 512)
        rows.append(
            (i, kind, payload, (64 + i % 32, 48, 1 + i % 8, 16000))
        )
    return rows


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rows = [(i, k, bytearray(p), m) for i, k, p, m in media_rows(n, seed)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature = byte-histogram
    moments. Replace with PIL/torchvision/ffmpeg in production — marked
    clearly as the STUB boundary."""
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    feats = [a.mean(), a.std(), a.min(), a.max()]
    feats += [float(np.mean(a[k::4])) for k in range(dim - 4)]
    return np.array(feats[:dim], dtype=np.float32)


def extract_features(media: DataFrame, dim: int = 8, strict: bool = False) -> DataFrame:
    """Binary payload -> feature vector via mapInPandas (Arrow batches)."""

    def run(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires codec libs absent in sandbox"
                )
            feats = [
                _fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
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
    """Video frame sampling contract: one row per sampled frame with a
    deterministic digest (frame decode itself is the stub boundary)."""
    import hashlib

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_bytes": [], "digest": []}
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                n_frames = int(meta["n_frames"])
                for fi in range(0, n_frames, every_nth):
                    chunk = bytes(payload)[fi::max(n_frames, 1)]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_bytes"].append(len(chunk))
                    out["digest"].append(hashlib.md5(bytes([fi]) + chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_meta(media: DataFrame, max_w: int = 32) -> DataFrame:
    """Resize planning is pure metadata math -> stays JVM-side entirely."""
    w = F.col("meta.width")
    scale = F.least(F.lit(1.0), F.lit(max_w) / w)
    return media.select(
        "media_id", "kind",
        w.alias("width"),
        F.col("meta.height").alias("height"),
        F.round(w * scale).cast("int").alias("new_width"),
        F.round(F.col("meta.height") * scale).cast("int").alias("new_height"),
    )
