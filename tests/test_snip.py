"""S9 snip sink: pruned CTAS with pushdown evidence on the physical plan."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spinterps_spark.sources.snip import snip

SF = "/root/testdata/sf0.001"


def test_snip_prunes_columns_and_rows(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "snipped")
    snip(src, out, columns=["doc_id", "text"], where="doc_id < 100")

    files = glob.glob(out + "/*.parquet")
    assert files
    schema = pq.read_schema(files[0])
    assert set(schema.names) == {"doc_id", "text"}
    back = spark.read.parquet(out)
    assert back.count() == src.where("doc_id < 100").count()
    assert (back.toPandas()["doc_id"] < 100).all()


def test_snip_pushdown_reaches_scan(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/documents.parquet")
    pruned = src.where("doc_id < 100").select("doc_id", "text")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)" in plan, plan
    # scan schema restricted to the snipped columns
    assert "n_chars" not in plan.split("ReadSchema")[-1]


def test_snip_partitioned(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "by_day")
    snip(src, out, columns=["user_id", "value", "day"], partition_by=("day",))
    assert glob.glob(out + "/day=*/*.parquet")
