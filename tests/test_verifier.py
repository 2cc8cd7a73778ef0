"""Range-count verifier (cmd/verifier parity, Spark-first one-pass)."""

from gravity_spark.operators.verifier import (
    leaf_counts,
    range_count_compare,
    sharded_union,
)


def test_all_match_is_empty(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    assert range_count_compare(df, df, "k", 0, 1023, depth=4).count() == 0


def test_mismatch_localized_to_leaf(spark):
    src = spark.range(0, 1024).withColumnRenamed("id", "k")
    # drop k=700 and add a stray k=2000 (out of range → ignored)
    tgt = src.filter("k <> 700").union(
        spark.range(2000, 2001).withColumnRenamed("id", "k")
    )
    rows = range_count_compare(src, tgt, "k", 0, 1023, depth=4).collect()
    assert len(rows) == 1
    r = rows[0]
    # 16 leaves of width 64: k=700 lives in [640, 703]
    assert (r["range_lo"], r["range_hi"]) == (640, 703)
    assert (r["source_cnt"], r["target_cnt"], r["diff"]) == (64, 63, -1)


def test_boundary_rows_counted_inclusively(spark):
    # BETWEEN lo AND hi is inclusive on both ends (main.go:361-363)
    src = spark.range(0, 1024).withColumnRenamed("id", "k")
    tgt = src.filter("k <> 0 AND k <> 1023")
    rows = {
        r["range_lo"]: r["diff"]
        for r in range_count_compare(src, tgt, "k", 0, 1023, depth=4).collect()
    }
    assert rows == {0: -1, 960: -1}


def test_sharded_union_compare(spark):
    # Shading mode: two source shards vs a merged target missing a row
    s0 = spark.range(0, 100).withColumnRenamed("id", "k")
    s1 = spark.range(100, 200).withColumnRenamed("id", "k")
    src = sharded_union([("t_0", s0), ("t_1", s1)])
    assert src.filter("__shard = 't_1'").count() == 100
    tgt = spark.range(0, 200).filter("id <> 150").withColumnRenamed("id", "k")
    rows = range_count_compare(src, tgt, "k", 0, 255, depth=4).collect()
    assert len(rows) == 1
    assert rows[0]["range_lo"] == 144 and rows[0]["diff"] == -1


def test_leaf_counts_cover_all_rows(spark):
    df = spark.range(0, 777).withColumnRenamed("id", "k")
    leaves = leaf_counts(df, "k", 0, 1023, 4, "n")
    total = sum(r["n"] for r in leaves.collect())
    assert total == 777
