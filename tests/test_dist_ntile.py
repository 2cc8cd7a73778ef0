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


def _check_multi(spark, columns, k, n_buckets=8):
    """columns: dict metric_name -> list of values (same length)."""
    from gravity_spark.queries import _dist_ntile_multi

    n = len(next(iter(columns.values())))
    rows = [tuple([i] + [columns[m][i] for m in columns]) for i in range(n)]
    schema = "tie long, " + ", ".join(f"{m} long" for m in columns)
    df = spark.createDataFrame(rows, schema)
    specs = [(m, "tie", f"t_{m}") for m in columns]
    got = {
        r["tie"]: tuple(r[f"t_{m}"] for m in columns)
        for r in _dist_ntile_multi(df, specs, k, n_buckets).collect()
    }
    want = {}
    for j, m in enumerate(columns):
        pairs = sorted(((i, v) for i, v in enumerate(columns[m])),
                       key=lambda p: (p[1], p[0]))
        tiles = _py_ntile(pairs, k)
        for (tie, _), t in tiles.items():
            want.setdefault(tie, [None] * len(columns))[j] = t
    assert got == {tie: tuple(ts) for tie, ts in want.items()}


def test_dist_ntile_multi_matches_per_metric_ntile(spark):
    """The fused multi-metric pass must equal independent SQL ntiles,
    including under heavy ties on one metric and skew on another."""
    rng = random.Random(11)
    n = 123
    _check_multi(spark, {
        "r": [rng.randrange(50) for _ in range(n)],      # many ties
        "f": [rng.choice([1, 1, 1, 2, 9]) for _ in range(n)],  # few distinct
        "m": [rng.randrange(10**6) for _ in range(n)],   # wide spread
    }, 5)


def test_dist_ntile_multi_small_n_and_exact_division(spark):
    _check_multi(spark, {"a": [30, 10, 20], "b": [1, 2, 3]}, 5)
    _check_multi(spark, {"a": list(range(100)), "b": list(range(100, 0, -1))}, 4)
