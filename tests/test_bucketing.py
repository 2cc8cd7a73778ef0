"""Bucketed co-located joins: the shuffle-elimination path for repeated
big-big joins at 100 TB (SURVEY §4 / PLANS.md scale invariants)."""

import shutil

from pyspark.sql import functions as F


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_eliminates_shuffle(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n = 10_000
        left = spark.range(n).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
        right = spark.range(n).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
        for t in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_left")
        right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_right")

        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = _explain(joined)
        # co-bucketed scans sort-merge join with NO exchange
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        assert joined.count() == n

        # sanity: the same join on unbucketed frames DOES shuffle
        assert "Exchange" in _explain(left.join(right, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("bkt_left", "bkt_right"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
