from pyspark.sql import functions as F

from gravity_spark.core.catalog import Catalog, ColumnDef, TableDef
from gravity_spark.core.envelope import memory_changes
from gravity_spark.operators.skew import salted_agg, salted_join, top_frequent_keys
from gravity_spark.sinks.multi_table import MultiTableMergeSink
from gravity_spark.sinks.parquet_merge import ParquetMergeTarget


def test_multi_table_fanout(spark, tmp_path):
    cat = Catalog()
    cat.put(TableDef("app", "users",
                     [ColumnDef("id", "bigint", is_pk=True), ColumnDef("v", "varchar(10)")]))
    cat.put(TableDef("app", "orders",
                     [ColumnDef("id", "bigint", is_pk=True), ColumnDef("amt", "decimal(10,2)")]))
    sink = MultiTableMergeSink(
        {
            ("app", "users"): ParquetMergeTarget(
                spark, str(tmp_path / "users"), ["id"], "id bigint, v string"),
            ("app", "orders"): ParquetMergeTarget(
                spark, str(tmp_path / "orders"), ["id"], "id bigint, amt decimal(10,2)"),
        },
        cat,
    )
    batch = memory_changes(spark, [
        {"database": "app", "table": "users", "op": "insert",
         "data": {"id": 1, "v": "a"}, "pks": {"id": 1}, "seq": 1},
        {"database": "app", "table": "orders", "op": "insert",
         "data": {"id": 10, "amt": "9.99"}, "pks": {"id": 10}, "seq": 2},
        {"database": "app", "table": "users", "op": "update",
         "data": {"id": 1, "v": "b"}, "pks": {"id": 1}, "seq": 3},
        {"database": "app", "table": "unrouted", "op": "insert",
         "data": {"id": 5}, "pks": {"id": 5}, "seq": 4},
    ])
    sink.apply_batch(batch, epoch_id=0)
    users = {r["id"]: r["v"] for r in sink.read("app", "users").collect()}
    orders = {r["id"]: str(r["amt"]) for r in sink.read("app", "orders").collect()}
    assert users == {1: "b"}
    assert orders == {10: "9.99"}


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(1000)], "k int, v double"
    )
    plain = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["total"], r["n"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"total": ("sum", "v"), "n": ("count", "*"), "mx": ("max", "v")}
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame([(i % 5, i) for i in range(500)], "k int, x long")
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(5)], "k int, label string")
    plain = sorted((r["x"], r["label"]) for r in big.join(small, "k").collect())
    salted = sorted((r["x"], r["label"]) for r in salted_join(big, small, "k").collect())
    assert plain == salted


def test_top_frequent_keys(spark):
    rows = [(1,)] * 500 + [(i,) for i in range(2, 102)]
    df = spark.createDataFrame(rows, "k int")
    assert top_frequent_keys(df, "k", 0.5) == [1]
