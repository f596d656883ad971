"""High-cardinality grouped-map execution: mapInPandas + boundary stitching.

applyInPandas pays a fixed per-group cost (one pandas DataFrame build +
Python call per group). With millions of small groups (one per conversation)
that overhead dominates the actual math. This utility keeps the same
semantics but amortizes it:

    repartition(key) -> sortWithinPartitions(key, order) -> mapInPandas

Within a partition, rows of a group are contiguous; the generator stitches
groups that straddle Arrow batch boundaries by carrying the trailing group
into the next batch, then hands the whole batch (complete groups only,
sorted) to a vectorized batch function — one Python call per ~64k rows.

Reference precedent: the Spark translation of the reference's "chunk of
steps per worker, loop groups inside" plan (interp/main.py:652-859) rather
than one task per group.

Scale: groups larger than memory must be pre-split by a chunk key (the
caller's job — see gapfill chunk_buckets); the stitcher holds at most one
group across batches.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def group_bounds(pdf: pd.DataFrame, key_cols: list[str]) -> np.ndarray:
    """Start indices of key groups in a key-sorted frame."""
    n = len(pdf)
    if n == 0:
        return np.array([], dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for c in key_cols:
        a = pdf[c].to_numpy()
        change[1:] |= a[1:] != a[:-1]
    return np.flatnonzero(change)


def apply_grouped_batches(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    batch_fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    n_parts: int | None = None,
) -> DataFrame:
    """Run batch_fn over stitched batches of complete, key-contiguous,
    order-sorted groups. batch_fn must handle multiple groups per call
    (use group_bounds) and return a DataFrame matching `schema`.

    n_parts=None sizes the shuffle from the input's Catalyst size estimate
    (VERDICT r1: the fixed defaultParallelism*2 was not data-aware and
    risked multi-GB Arrow tasks at larger scale): ~64 MB of estimated plan
    bytes per partition, floored at the core count, capped at 200k tasks.
    Callers with better knowledge (e.g. row-exploding fills) pass n_parts."""
    spark = df.sparkSession
    if n_parts is None:
        dp = spark.sparkContext.defaultParallelism
        try:
            size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:
            size = -1
        if 0 < size < (1 << 50):  # unknown stats come back ~Long.MaxValue
            target = 64 << 20
            n_parts = int(max(dp, min(200_000, -(-size // target))))
        else:
            n_parts = max(dp * 2, 8)
    part = df.repartition(n_parts, *key_cols).sortWithinPartitions(
        *key_cols, order_col
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            starts = group_bounds(pdf, key_cols)
            if len(starts) == 0:
                continue
            last_start = starts[-1]
            # hold back the last group: it may continue in the next batch
            carry = pdf.iloc[last_start:]
            body = pdf.iloc[:last_start].reset_index(drop=True)
            if len(body):
                yield batch_fn(body)
        if carry is not None and len(carry):
            yield batch_fn(carry.reset_index(drop=True))

    return part.mapInPandas(run, schema=schema)
