"""Invariants for the Laspeyres price index and segment migration.

- parts_price_index: base month indexes at exactly 1000 milli, every
  month's basket is the base basket (n_parts constant == base size
  intersected with that month), and the index matches a local exact
  rational recomputation.
- customer_segment_migration: matrix counts sum to |customers active
  in either half|, no (0, 0) cell, and each period's tertile sizes
  obey the ntile head rule.
"""

from collections import defaultdict
from fractions import Fraction

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_price_index_base_and_exactness(spark, sf_dir):
    rows = {
        r["month_idx"]: r
        for r in REGISTRY["parts_price_index"].spark(spark, sf_dir).collect()
    }
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("midx"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    ).collect()
    pm = defaultdict(lambda: [0, 0])
    for r in li:
        cell = pm[(r["l_partkey"], r["midx"])]
        cell[0] += r["pc"]
        cell[1] += r["qc"]
    base_m = min(m for _, m in pm)
    base = {pk: v for (pk, m), v in pm.items() if m == base_m}
    assert rows[base_m]["index_milli"] == 1000
    for m, r in rows.items():
        num = den = 0
        n = 0
        for (pk, mm), (pt, _) in pm.items():
            if mm == m and pk in base:
                p0, q0 = base[pk]
                num += pt * q0
                den += p0 * q0
                n += 1
        assert r["n_parts"] == n
        expect = (2000 * num + den) // (2 * den)
        assert r["index_milli"] == expect
        # sanity: a real index, not a degenerate ratio
        assert Fraction(num, den) > 0


def test_segment_migration_matrix(spark, sf_dir):
    rows = REGISTRY["customer_segment_migration"].spark(spark, sf_dir).collect()
    orders = T(spark, sf_dir, "orders").select(
        "o_custkey", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("us")
    ).collect()
    los = min(r["us"] for r in orders)
    his = max(r["us"] for r in orders)
    cut = (los + his) // 2
    in_p1 = {r["o_custkey"] for r in orders if r["us"] <= cut}
    in_p2 = {r["o_custkey"] for r in orders if r["us"] > cut}
    total = len(in_p1 | in_p2)
    assert sum(r["n_customers"] for r in rows) == total
    for r in rows:
        assert (r["seg_from"], r["seg_to"]) != (0, 0)
        assert 0 <= r["seg_from"] <= 3 and 0 <= r["seg_to"] <= 3
    # from-margin: customers with seg_from == 0 are exactly p2-only
    from_zero = sum(r["n_customers"] for r in rows if r["seg_from"] == 0)
    assert from_zero == len(in_p2 - in_p1)
    to_zero = sum(r["n_customers"] for r in rows if r["seg_to"] == 0)
    assert to_zero == len(in_p1 - in_p2)
    # each period's tertiles are balanced (ntile head rule)
    for seg_col, present in (("seg_from", in_p1), ("seg_to", in_p2)):
        sizes = defaultdict(int)
        for r in rows:
            if r[seg_col] > 0:
                sizes[r[seg_col]] += r["n_customers"]
        assert sum(sizes.values()) == len(present)
        assert max(sizes.values()) - min(sizes.values()) <= 1
