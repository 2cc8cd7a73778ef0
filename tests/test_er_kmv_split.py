"""Invariant tests for entity resolution, KMV set ops, the group-aware
split, and MAD anomaly detection.

The exact-value gate is the DuckDB oracle (tools/check_oracle.py);
these pin the semantic invariants: ER recovers exactly the planted
duplicates, KMV estimates stay inside the k=64 error envelope, the
group split leaks nothing and partitions the table, and a zero-MAD
series degrades to zero flags instead of NaN.
"""

import math

from gravity_spark.queries import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir)


def test_entity_resolution_recovers_planted_duplicates(spark, sf_dir):
    rows = _run("entity_resolution_customers", spark, sf_dir).collect()
    assert rows, "planted duplicates must be found"
    for r in rows:
        # every multi-record entity is one planted orig+variant pair
        assert r.entity_custkey % 7 == 0
        assert r.n_records == 2
    # and every planted variant was resolved (customers are 1..150 at
    # sf0.001 — one variant per custkey % 7 == 0)
    found = {r.entity_custkey for r in rows}
    spark_c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    planted = {
        r.c_custkey
        for r in spark_c.select("c_custkey").collect()
        if r.c_custkey % 7 == 0
    }
    assert found == planted


def test_kmv_set_ops_error_envelope(spark, sf_dir):
    row = _run("kmv_set_ops", spark, sf_dir).collect()[0]
    assert row.exact_union >= max(row.exact_a, row.exact_b)
    assert row.exact_inter <= min(row.exact_a, row.exact_b)
    # k=64 → relative std err ~ 1/sqrt(64) = 12.5%; allow 4 sigma.
    for est, exact in [
        (row.est_a, row.exact_a),
        (row.est_b, row.exact_b),
        (row.est_union, row.exact_union),
    ]:
        assert est > 0
        assert abs(est - exact) <= 0.5 * exact + 1
    # intersection compounds two estimates; just demand the right scale
    assert 0 <= row.est_inter <= 2 * row.exact_union
    assert not math.isnan(row.est_inter)


def test_group_split_partitions_without_leakage(spark, sf_dir):
    rows = _run("train_split_group_aware", spark, sf_dir).collect()
    assert {r.split for r in rows} == {"train", "val", "test"}
    assert all(r.leaked_customers == 0 for r in rows)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert sum(r.n_orders for r in rows) == orders.count()
    assert sum(r.n_customers for r in rows) == (
        orders.select("o_custkey").distinct().count()
    )
    # train is the largest split under the 80/10/10 hash
    by = {r.split: r.n_customers for r in rows}
    assert by["train"] > by["val"] and by["train"] > by["test"]


def test_changepoint_one_row_per_type(spark, sf_dir):
    rows = _run("events_changepoint_cusum", spark, sf_dir).collect()
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types)) > 0
    # cusum of the full series telescopes to zero, so the peak is
    # strictly interior unless the series is flat
    for r in rows:
        assert isinstance(r.max_cusum, int)


def test_cluster_split_no_leakage_and_partition(spark, sf_dir):
    rows = _run("dedup_cluster_aware_split", spark, sf_dir).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.leaked_clusters == 0 for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert all(r.n_clusters <= r.n_docs for r in rows)


def test_mad_zero_dispersion_degrades_cleanly(spark, sf_dir):
    # at sf0.001 every (type, hour) count is 1 → MAD = 0 for all types;
    # the contract is zero flagged rows, never NaN/div-by-zero
    rows = _run("events_anomaly_mad", spark, sf_dir).collect()
    for r in rows:
        assert not math.isnan(r.robust_z)
        assert abs(r.robust_z) >= 2.0
