"""Driver contract for the spark-graft builder (PySpark target).

entry       — flagship: full retention slice (1m->1h rollup cascade, spine,
              IDW gap-fill) over the deterministic sf0.001 transcript fixture.
queries     — one entry per implemented operator family (SURVEY.md §2),
              each oracle-checked against DuckDB where SQL-expressible.
oracle_sql  — matching ANSI SQL strings (DuckDB dialect) over the same
              parquet inputs; transcript fixtures are materialized
              deterministically under .fixtures/ and read by both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spinterps_spark import queries as _Q
from spinterps_spark.operators import gapfill as _G
from spinterps_spark.operators import rollup as _R
from spinterps_spark.operators import spine as _S
from spinterps_spark.sources import fixtures as _fx


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: gap-filled 1h token-length series for every
    conversation (rollup cascade -> spine -> IDW temporal gap-fill)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    t = _fx.load_transcripts(spark, "/root/testdata/sf0.001")
    m1 = _R.base_rollup(t, "1m", n_salt=16)
    h1 = _R.rollup_tier(m1, "1h", min_cnt=1)
    spined = _S.with_spine(h1, "1h")
    ser = spined.selectExpr(
        "conv_id", "bucket_ts", "tok_len_sum / turn_cnt AS tok_len_mean"
    )
    return _G.gapfill(ser, "tok_len_mean", method="IDW", tier="1h")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()
