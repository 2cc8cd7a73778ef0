"""Invariants for the dispersion index and degree assortativity.

- events_dispersion_index: VMR recomputes from a local replay; a
  synthetic constant series scores 0 and a bursty one scores > 1.
- graph_degree_assortativity: coefficient in [-1, 1], matches a local
  numpy Pearson over the edge-degree pairs.
"""

import statistics
from collections import defaultdict

import numpy as np

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_dispersion_recompute(spark, sf_dir):
    rows = REGISTRY["events_dispersion_index"].spark(spark, sf_dir).collect()
    ev = T(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("d")
    ).collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in ev:
        counts[r["event_type"]][r["d"]] += 1
    assert {r["event_type"] for r in rows} == set(counts)
    for r in rows:
        ns = list(counts[r["event_type"]].values())
        assert r["n_days"] == len(ns)
        assert r["n_events"] == sum(ns)
        vmr = statistics.variance(ns) / statistics.mean(ns)
        assert abs(r["dispersion_index"] - vmr) < 1e-6
    # sanity of the metric itself
    assert statistics.variance([5, 5, 5, 5]) == 0  # constant -> VMR 0
    bursty = [0, 0, 0, 20]
    assert statistics.variance(bursty) / statistics.mean(bursty) > 1


def test_assortativity_matches_numpy(spark, sf_dir):
    r = REGISTRY["graph_degree_assortativity"].spark(spark, sf_dir).collect()[0]
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    edges = {
        (e["o_custkey"], e["l_partkey"])
        for e in li.join(orders, "l_orderkey").collect()
    }
    cd = defaultdict(int)
    pd_ = defaultdict(int)
    for ck, pk in edges:
        cd[ck] += 1
        pd_[pk] += 1
    du = np.array([cd[ck] for ck, _ in edges], dtype=float)
    dv = np.array([pd_[pk] for _, pk in edges], dtype=float)
    assert r["n_edges"] == len(edges)
    local = np.corrcoef(du, dv)[0, 1]
    assert abs(r["assortativity"] - local) < 1e-6
    assert -1.0 <= r["assortativity"] <= 1.0
