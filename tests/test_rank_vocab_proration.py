"""Invariants for the leaderboard / vocab-growth / proration /
source-overlap operators.

- order_proration_residual: THE invariant — per-order allocations sum
  exactly to the order total in cents, and each allocation is within
  one cent of the exact proportional share (largest-remainder bound).
- vocab_growth_heaps: cumulative series are monotone and terminate at
  the corpus totals; new_types tile the type set.
- revenue_rank_movement: each month carries ranks 1..k with no
  duplicates; moved == prev_rank - rank wherever prev exists.
- source_vocab_jaccard: all C(n_sources, 2) pairs present, intersection
  bounded by both set sizes, jaccard in [0, 1].
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T
from gravity_spark.functions import text as tx


def test_proration_sums_exactly(spark, sf_dir):
    # NOTE: (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # testdata (duplicate line rows exist), so the check is multiset-
    # shaped per order, never dict-keyed by line number. Ties in the
    # remainder rank between duplicate rows only swap identical output
    # rows, so the operator stays deterministic under sorted compare.
    rows = REGISTRY["order_proration_residual"].spark(spark, sf_dir).collect()
    totals = {
        r["o_orderkey"]: int(round(r["o_totalprice"] * 100))
        for r in T(spark, sf_dir, "orders").collect()
    }
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("w"),
    ).collect()
    w_by_order = defaultdict(list)
    for r in li:
        w_by_order[r["l_orderkey"]].append(r["w"])
    alloc_by_order = defaultdict(list)
    for r in rows:
        assert r["alloc_cents"] >= 0
        alloc_by_order[r["l_orderkey"]].append(r["alloc_cents"])
    assert set(alloc_by_order) == set(w_by_order)
    for ok, allocs in alloc_by_order.items():
        t, ws = totals[ok], w_by_order[ok]
        assert len(allocs) == len(ws)
        assert sum(allocs) == t, f"order {ok}: alloc {sum(allocs)} != {t}"
        tw = sum(ws)
        floors = sorted(t * w // tw for w in ws)
        for a, f in zip(sorted(allocs), floors):
            assert f <= a <= f + 1


def test_vocab_growth_monotone_and_totals(spark, sf_dir):
    rows = sorted(
        REGISTRY["vocab_growth_heaps"].spark(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tx.tokenize(F.col("text"))).alias("t"))
    n_inst = toks.count()
    n_types = toks.distinct().count()
    assert rows[-1]["cum_tokens"] == n_inst
    assert rows[-1]["cum_types"] == n_types
    assert sum(r["new_types"] for r in rows) == n_types
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] > a["cum_tokens"]
        assert b["cum_types"] >= a["cum_types"]
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_rank_movement_structure(spark, sf_dir):
    rows = REGISTRY["revenue_rank_movement"].spark(spark, sf_dir).collect()
    by_month = defaultdict(list)
    for r in rows:
        by_month[r["month_epoch"]].append(r)
        if r["prev_rank"] is not None:
            assert r["moved"] == r["prev_rank"] - r["rank"]
        else:
            assert r["moved"] is None
    for m, rs in by_month.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))  # dense, unique
        assert len(ranks) <= 10
        # revenue non-increasing along rank
        rs.sort(key=lambda r: r["rank"])
        for a, b in zip(rs, rs[1:]):
            assert a["rev_cents"] >= b["rev_cents"]


def test_source_jaccard_bounds(spark, sf_dir):
    rows = REGISTRY["source_vocab_jaccard"].spark(spark, sf_dir).collect()
    docs = T(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources * (n_sources - 1) // 2
    sizes = {
        r["source"]: r["n"]
        for r in docs.select(
            "source", F.explode(tx.tokenize(F.col("text"))).alias("t")
        )
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["s1"] < r["s2"]
        assert 0 < r["isect"] <= min(sizes[r["s1"]], sizes[r["s2"]])
        assert r["union_size"] == sizes[r["s1"]] + sizes[r["s2"]] - r["isect"]
        assert 0.0 <= r["jaccard"] <= 1.0
