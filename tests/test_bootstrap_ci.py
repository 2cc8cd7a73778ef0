"""Invariants for the deterministic multiplier bootstrap.

- CI brackets the point estimate; replicate means recompute exactly
  from a local replay of the hash weights; determinism across runs;
  CI width scales like 1/sqrt(n) across SFs (checked loosely at the
  fixture scale vs theoretical sigma).
"""

from gravity_spark.queries import (
    REGISTRY, T, _HP, _HA, _BOOT_B,
)
from pyspark.sql import functions as F


def _phash(x: int) -> int:
    return (_HA * (x % _HP)) % _HP


def _weight(key: int, rep: int) -> int:
    h = _phash(key * _BOOT_B + rep)
    return sum(1 for i in range(4) if (h // (4 ** i)) % 4 == 3)


def test_bootstrap_recompute_and_bracket(spark, sf_dir):
    r = REGISTRY["bootstrap_mean_ci_orders"].spark(spark, sf_dir).collect()[0]
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect()
    means = []
    for b in range(_BOOT_B):
        swx = sw = 0
        for o in orders:
            w = _weight(o["o_orderkey"], b)
            swx += w * o["cents"]
            sw += w
        if sw > 0:
            means.append((2 * swx + sw) // (2 * sw))
    means.sort()
    assert r["n_replicates"] == len(means)
    assert r["ci_lo_cents"] == means[1]
    assert r["ci_hi_cents"] == means[len(means) - 2]
    n = len(orders)
    mean = (2 * sum(o["cents"] for o in orders) + n) // (2 * n)
    assert r["mean_cents"] == mean
    assert r["ci_lo_cents"] <= mean <= r["ci_hi_cents"]
    # width is the right order of magnitude: sigma/sqrt(n) scale
    import statistics

    sigma = statistics.pstdev([o["cents"] for o in orders])
    width = r["ci_hi_cents"] - r["ci_lo_cents"]
    se = sigma / n ** 0.5
    assert se < width < 12 * se

    # determinism across a second run
    r2 = REGISTRY["bootstrap_mean_ci_orders"].spark(spark, sf_dir).collect()[0]
    assert r == r2
