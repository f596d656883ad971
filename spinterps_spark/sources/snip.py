"""S9 snip sink: pruned CTAS (reference `snip` output — a column/row subset
of a cube written as its own artifact, SURVEY.md §2.1 S9).

Spark-first: the projection and predicate are expressed declaratively so
Catalyst pushes them INTO the source scan (PushedFilters / ReadSchema on
parquet) — the snip never reads columns or row groups it does not keep.
tests/test_snip.py asserts the pushdown on the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def snip(
    df: DataFrame,
    out_path: str,
    columns: list[str] | None = None,
    where: str | None = None,
    partition_by: tuple[str, ...] = (),
) -> str:
    """Write a pruned copy of df: optional predicate + column subset.
    Returns out_path. Filter-before-project so the predicate may reference
    pruned-away columns."""
    out = df
    if where:
        out = out.where(where)
    if columns:
        out = out.select(*columns)
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(out_path)
    return out_path
