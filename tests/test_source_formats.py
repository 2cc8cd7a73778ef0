"""Batch-source format breadth: the engine's snapshot path must ingest
parquet, CSV, JSON-lines, and ORC identically (the reference's
mysql-batch equivalent is "whatever dump format ops hands us").

Round-trip: write the sf0.001 orders table in each format, read it back
with an explicit schema through the normal reader, and require exact
row-set equality with the parquet original.
"""

from pyspark.sql import functions as F


def _orders(spark, sf_dir):
    # orders has no nano-timestamp column, so the plain reader suffices;
    # normalize ts to epoch micros for format-neutral comparison
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
        "o_orderpriority",
    )


def _assert_same(a, b):
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir)
    p = str(tmp_path / "orders_csv")
    base.write.mode("overwrite").option("header", True).csv(p)
    back = spark.read.schema(base.schema).option("header", True).csv(p)
    _assert_same(base, back)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir)
    p = str(tmp_path / "orders_json")
    base.write.mode("overwrite").json(p)
    back = spark.read.schema(base.schema).json(p)
    _assert_same(base, back)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    base = _orders(spark, sf_dir)
    p = str(tmp_path / "orders_orc")
    base.write.mode("overwrite").orc(p)
    back = spark.read.schema(base.schema).orc(p)
    _assert_same(base, back)
