import datetime as dt
import random

from pyspark.sql import functions as F

from gravity_spark.operators.asof import asof_join, asof_join_pandas


def test_pandas_asof_matches_union_sort(spark):
    rng = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    left_rows = [
        (i, f"k{rng.randrange(5)}", base + dt.timedelta(minutes=rng.randrange(1000)))
        for i in range(200)
    ]
    right_rows = [
        (1000 + i, f"k{rng.randrange(5)}", base + dt.timedelta(minutes=rng.randrange(1000)))
        for i in range(100)
    ]
    left = spark.createDataFrame(left_rows, "lid long, k string, lts timestamp")
    right = spark.createDataFrame(right_rows, "rid long, k string, rts timestamp")

    a = {r["lid"]: r["rid"] for r in asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_id="rid").collect()}
    b = {r["lid"]: r["rid"] for r in asof_join_pandas(
        left, right, on="k", left_ts="lts", right_ts="rts", right_id="rid").collect()}
    assert a == b


def test_pandas_asof_key_with_no_right_rows(spark):
    left = spark.createDataFrame(
        [(1, "only-left", dt.datetime(2024, 1, 1))], "lid long, k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [(9, "other", dt.datetime(2024, 1, 1))], "rid long, k string, rts timestamp"
    )
    out = asof_join_pandas(left, right, on="k", left_ts="lts", right_ts="rts", right_id="rid")
    assert out.collect()[0]["rid"] is None
