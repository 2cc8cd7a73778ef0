"""Invariant tests for the time-series additions (EWMA, autocorrelation,
backlog sweep) and the frontier/audit operators (weighted median,
Benford, skyline). Exact values are gated by the DuckDB oracle; these
pin semantics an oracle refactor could lose.
"""

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir)


def test_ewma_bounded_by_series_extremes(spark, sf_dir):
    rows = _run("events_ewma_smooth", spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        lo = min(r.n_events for r in rs)
        hi = max(r.n_events for r in rs)
        for r in rs:
            # convex combination of observed counts
            assert lo - 1e-9 <= r.ewma <= hi + 1e-9
    # a single-observation prefix equals its own value: the first hour
    # of each type has ewma == n (no earlier points in the band)
    for t, rs in by_type.items():
        first = min(rs, key=lambda r: r.hour_bucket)
        assert abs(first.ewma - first.n_events) < 1e-9


def test_autocorrelation_in_range(spark, sf_dir):
    rows = _run("events_autocorrelation", spark, sf_dir).collect()
    assert rows
    assert {r.lag for r in rows} <= {1, 24}
    for r in rows:
        assert -1.000001 <= r.acf <= 1.000001
        assert r.cnt > 2


def test_backlog_nonnegative_and_closes_to_zero(spark, sf_dir):
    rows = sorted(_run("orders_open_backlog", spark, sf_dir).collect(),
                  key=lambda r: r.day)
    assert rows
    for r in rows:
        assert r.open_orders >= 0
    # every opened order eventually closes: the final running total is 0
    assert rows[-1].open_orders == 0
    assert sum(r.net_change for r in rows) == 0
    # peak backlog must reach at least one order
    assert max(r.open_orders for r in rows) > 0


def test_weighted_median_is_weight_midpoint(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rows = _run("weighted_median_descent", spark, sf_dir).collect()
    assert {r.l_returnflag for r in rows} == {"A", "N", "R"}
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") * 100).cast("long").alias("c"),
        (F.col("l_quantity") * 100).cast("long").alias("w"),
    )
    for r in rows:
        below = (
            t.filter((F.col("flag") == r.l_returnflag)
                     & (F.col("c") <= r.median_cents))
            .agg(F.sum("w")).collect()[0][0]
        )
        strictly_below = (
            t.filter((F.col("flag") == r.l_returnflag)
                     & (F.col("c") < r.median_cents))
            .agg(F.sum("w")).collect()[0][0] or 0
        )
        # median_cents is the smallest value whose cumulative weight
        # reaches half the total
        assert 2 * below >= r.total_weight
        assert 2 * strictly_below < r.total_weight


def test_benford_chi2_consistency(spark, sf_dir):
    rows = _run("orders_benford_audit", spark, sf_dir).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    assert sum(r.observed for r in rows) == n
    assert abs(sum(r.expected for r in rows) - n) < 1e-3
    for r in rows:
        assert r.chi2_part >= 0


def test_seasonal_anomaly_integer_consistency(spark, sf_dir):
    rows = _run("events_seasonal_anomaly", spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.hod < 24
        assert r.hod == r.hour_bucket % 24
        assert r.dev_scaled != 0  # a flagged hour deviates by definition


def test_lpa_is_deterministic_partition(spark, sf_dir):
    rows = _run("graph_label_propagation", spark, sf_dir).collect()
    assert rows
    # labels are vertex ids; csize agrees with the actual partition
    from collections import Counter

    sizes = Counter(r.community for r in rows)
    verts = {r.vertex for r in rows}
    for r in rows:
        assert r.csize == sizes[r.community]
        assert r.community in verts or sizes[r.community] >= 1
    # deterministic across runs
    again = {(r.vertex, r.community)
             for r in _run("graph_label_propagation", spark, sf_dir).collect()}
    assert {(r.vertex, r.community) for r in rows} == again


def test_join_cardinality_estimator_envelope(spark, sf_dir):
    row = _run("join_cardinality_estimate", spark, sf_dir).collect()[0]
    assert row.sampled_keys > 0
    assert row.est_pairs % 32 == 0
    # the estimator is unbiased over keys; demand the right order of
    # magnitude rather than tight concentration at this sample size
    assert 0.2 * row.exact_pairs <= row.est_pairs <= 5 * row.exact_pairs
    assert abs(row.rel_err) <= 4.0


def test_gini_in_unit_interval(spark, sf_dir):
    rows = _run("docs_source_gini", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_docs > 0


def test_mmr_first_pick_is_nearest_and_ranks_distinct(spark, sf_dir):
    rows = sorted(_run("sim_mmr_diverse_topk", spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    # rank 1 is the plain nearest neighbour (MMR has nothing selected
    # yet, so it reduces to relevance)
    assert rows[0].dist_sq_q == min(r.dist_sq_q for r in rows)


def test_skyline_is_mutually_nondominated(spark, sf_dir):
    rows = _run("part_skyline_frontier", spark, sf_dir).collect()
    assert rows
    pts = [(r.price_cents, r.p_size) for r in rows]
    for i, (c1, s1) in enumerate(pts):
        for j, (c2, s2) in enumerate(pts):
            if i == j:
                continue
            assert not (
                c2 <= c1 and s2 >= s1 and (c2 < c1 or s2 > s1)
            ), "frontier contains a dominated point"
    # and the frontier dominates the global extremes' axes: it contains
    # the cheapest part and the largest part (ties broken arbitrarily)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    min_price = part.agg(
        F.min(F.round(F.col("p_retailprice") * 100, 0).cast("long"))
    ).collect()[0][0]
    max_size = part.agg(F.max("p_size")).collect()[0][0]
    assert min(c for c, _ in pts) == min_price
    assert max(s for _, s in pts) == max_size
