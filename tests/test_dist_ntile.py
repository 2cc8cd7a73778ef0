"""Distributed exact ntile (queries._dist_ntile): must equal SQL
ntile(k) OVER (ORDER BY metric, tie) — bucket-banding, per-bucket
ranks, and the head/tail tile formula — on randomized inputs including
heavy ties, few distinct values, and n not divisible by k."""

import random

from gravity_spark.queries import _dist_ntile


def _py_ntile(rows, k):
    """Reference: SQL ntile semantics — first n%k tiles get ceil(n/k)."""
    n = len(rows)
    q, r = divmod(n, k)
    out = {}
    idx = 0
    for tile in range(1, k + 1):
        size = q + 1 if tile <= r else q
        for _ in range(size):
            if idx >= n:
                break
            out[rows[idx]] = tile
            idx += 1
    return out


def _check(spark, metric_values, k, n_buckets=8):
    rows = [(i, v) for i, v in enumerate(metric_values)]
    df = spark.createDataFrame(rows, "tie long, m long")
    got = {
        r["tie"]: r["t"]
        for r in _dist_ntile(df, "m", "tie", "t", k, n_buckets).collect()
    }
    expected = _py_ntile(sorted(rows, key=lambda p: (p[1], p[0])), k)
    want = {tie: t for (tie, _), t in expected.items()}
    assert got == want


def test_dist_ntile_random_values(spark):
    rng = random.Random(5)
    _check(spark, [rng.randrange(1000) for _ in range(137)], 5)


def test_dist_ntile_heavy_ties_and_few_distinct(spark):
    rng = random.Random(9)
    # three distinct metric values → bucket parallelism degrades but
    # the assignment must stay exact, with ties broken by the tie col
    _check(spark, [rng.choice([7, 7, 7, 8, 9]) for _ in range(100)], 4)


def test_dist_ntile_small_n_edge(spark):
    # n < k: the first n tiles get one row each (SQL ntile edge)
    _check(spark, [30, 10, 20], 5)


def test_dist_ntile_exact_division(spark):
    _check(spark, list(range(100, 0, -1)), 4)  # n divisible by k
