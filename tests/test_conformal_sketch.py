"""Invariants for split conformal and the mergeable quantile sketch.

- conformal_interval_orders: q_hat equals the exact order statistic of
  local residuals, realized coverage >= 880 milli (the ~90% guarantee
  with finite-sample slack), and splits partition the orders.
- quantile_sketch_merge_rollup: is_lossless MUST be 1 (fixed-bin
  merge is exact), |err| < bin width by construction, exact median
  matches a local sort.
"""

from pyspark.sql import functions as F

from gravity_spark.queries import (
    REGISTRY, T, _HP, _HA, _QSK_W,
)


def _phash(x: int) -> int:
    return (_HA * (x % _HP)) % _HP


def test_conformal_exact_and_covered(spark, sf_dir):
    r = REGISTRY["conformal_interval_orders"].spark(spark, sf_dir).collect()[0]
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect()
    cal = [o["cents"] for o in orders if _phash(o["o_orderkey"]) % 2 == 1]
    tst = [o["cents"] for o in orders if _phash(o["o_orderkey"]) % 2 == 0]
    assert r["n_cal"] == len(cal) and r["n_test"] == len(tst)
    n = len(cal)
    pred = (2 * sum(cal) + n) // (2 * n)
    assert r["pred_cents"] == pred
    resid = sorted(abs(c - pred) for c in cal)
    k = min(n, (9 * (n + 1) + 9) // 10)
    assert r["q_hat_cents"] == resid[k - 1]
    covered = sum(1 for c in tst if abs(c - pred) <= r["q_hat_cents"])
    assert r["coverage_milli"] == (2000 * covered + len(tst)) // (2 * len(tst))
    assert r["coverage_milli"] >= 880  # conformal guarantee w/ slack


def test_sketch_merge_lossless_and_bounded(spark, sf_dir):
    r = REGISTRY["quantile_sketch_merge_rollup"].spark(spark, sf_dir).collect()[0]
    assert r["is_lossless"] == 1
    assert abs(r["err_v"]) < _QSK_W
    vals = sorted(
        int(round(c["c_acctbal"] * 100)) + 100000
        for c in T(spark, sf_dir, "customer").collect()
    )
    assert r["n"] == len(vals)
    assert r["exact_p50_v"] == vals[(len(vals) + 1) // 2 - 1]
    assert r["est_p50_v"] >= r["exact_p50_v"]  # upper bin edge estimate
