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


def test_forward_asof_with_tolerance_brute_force(spark):
    rng = random.Random(7)
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
    tol = 3600  # 60 minutes

    got = {r["lid"]: r["rid"] for r in asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_id="rid",
        direction="forward", tolerance_seconds=tol).collect()}

    want = {}
    for lid, k, lts in left_rows:
        cands = [
            (rts, rid) for rid, rk, rts in right_rows
            if rk == k and rts >= lts
            and (rts - lts).total_seconds() <= tol
        ]
        want[lid] = min(cands)[1] if cands else None
    assert got == want


def test_forward_asof_inclusive_equal_ts(spark):
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, "k", t)], "lid long, k string, lts timestamp")
    right = spark.createDataFrame(
        [(10, "k", t), (11, "k", t)], "rid long, k string, rts timestamp"
    )
    # equal timestamps are eligible forward matches; lowest rid wins
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_id="rid",
        direction="forward",
    ).collect()
    assert out[0]["rid"] == 10


def test_forward_asof_matches_pandas_merge_asof(spark):
    import pandas as pd

    rng = random.Random(21)
    base = dt.datetime(2024, 1, 1)
    left_rows = [
        (i, f"k{rng.randrange(4)}",
         base + dt.timedelta(seconds=rng.randrange(100000) / 10))
        for i in range(150)
    ]
    right_rows = [
        (1000 + i, f"k{rng.randrange(4)}",
         base + dt.timedelta(seconds=rng.randrange(100000) / 10))
        for i in range(80)
    ]
    left = spark.createDataFrame(left_rows, "lid long, k string, lts timestamp")
    right = spark.createDataFrame(right_rows, "rid long, k string, rts timestamp")

    got = {r["lid"]: r["rid"] for r in asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_id="rid",
        direction="forward", tolerance_seconds=1800).collect()}

    lp = pd.DataFrame(left_rows, columns=["lid", "k", "ts"]).sort_values("ts")
    rp = (
        pd.DataFrame(right_rows, columns=["rid", "k", "ts"])
        .sort_values(["ts", "rid"], kind="stable")
    )
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="forward",
        tolerance=pd.Timedelta(seconds=1800), allow_exact_matches=True,
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in merged.itertuples()
    }
    assert got == want
