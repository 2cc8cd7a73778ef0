"""Invariants for the keyspace-gap and duplicate-payment audits.

- orders_keyspace_gaps: the reported runs are exactly the simulated
  losses (portable-hash % 97 == 0 keys strictly inside the surviving
  range), runs are disjoint/sorted, and `missing` sums to the loss
  count.
- orders_duplicate_payment_audit: the reported pairs are exactly the
  injected replays (hash % 211 == 0, one day later, shifted key) —
  same customer, same cents, day_gap == 1.
"""

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T, _HP, _HA


def _phash(x: int) -> int:
    return (_HA * (x % _HP)) % _HP


def test_keyspace_gaps_name_simulated_losses(spark, sf_dir):
    rows = sorted(
        REGISTRY["orders_keyspace_gaps"].spark(spark, sf_dir).collect(),
        key=lambda r: r["gap_start"],
    )
    keys = [
        r["o_orderkey"]
        for r in T(spark, sf_dir, "orders").select("o_orderkey").collect()
    ]
    surviving = sorted(k for k in keys if _phash(k) % 97 != 0)
    lost = {
        k for k in keys
        if _phash(k) % 97 == 0 and surviving[0] < k < surviving[-1]
    }
    reported = set()
    prev_end = None
    for r in rows:
        assert r["gap_start"] <= r["gap_end"]
        assert r["missing"] == r["gap_end"] - r["gap_start"] + 1
        if prev_end is not None:
            assert r["gap_start"] > prev_end + 1  # disjoint, non-adjacent
        prev_end = r["gap_end"]
        reported.update(range(r["gap_start"], r["gap_end"] + 1))
    assert reported == lost
    assert sum(r["missing"] for r in rows) == len(lost)


def test_gap_runs_int64_extremes_each_gap_once(spark):
    """_gap_runs' by-construction claim: with fan=4096 and 6 levels the
    recursion covers ANY int64 keyspace — NEGATIVES INCLUDED (sharding
    is floor division, so shard 0 is not double-width around zero and
    the ≤8-rows-deepest-partition bound holds on both sign halves) —
    giant gaps spanning many shard levels are found, emitted exactly
    once, and dense runs inside one shard still surface at level 0."""
    from gravity_spark.queries import _gap_runs

    keys = [
        -(2**63),            # int64 minimum — floor-div must not overflow
        -(2**63) + 3,
        -(2**40),            # negative cross-level giant
        -5000, -4097, -4096, -1,  # the shard boundary truncation-div blurs
        0, 1, 2, 5,
        2**40, 2**40 + 1, 2**62, 2**62 + 3,
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = sorted(
        ((r["gap_start"], r["gap_end"]) for r in _gap_runs(df).collect())
    )
    expected = []
    s = sorted(keys)
    for a, b in zip(s, s[1:]):
        if b > a + 1:
            expected.append((a + 1, b - 1))
    assert rows == expected  # every gap exactly once, none missed
    # sanity: giants on both sign halves, incl. one crossing zero's shard
    assert (6, 2**40 - 1) in rows and (2**40 + 2, 2**62 - 1) in rows
    assert (-(2**63) + 4, -(2**40) - 1) in rows and (-4095, -1 - 1) in rows


def test_duplicate_payments_are_the_injected_replays(spark, sf_dir):
    rows = REGISTRY["orders_duplicate_payment_audit"].spark(spark, sf_dir).collect()
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).collect()
    injected = {
        (r["o_orderkey"], r["o_orderkey"] + 10000000): (r["o_custkey"], r["cents"])
        for r in orders
        if _phash(r["o_orderkey"]) % 211 == 0
    }
    got = {(r["k1"], r["k2"]): (r["o_custkey"], r["cents"]) for r in rows}
    assert got == injected
    for r in rows:
        assert r["day_gap"] == 1
