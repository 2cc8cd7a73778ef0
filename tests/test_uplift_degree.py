"""Invariants for uplift-by-quintile and the degree histogram.

- ab_uplift_by_decile: arm counts partition the user base, rates and
  uplift recompute exactly (including NULL empty-arm semantics), and
  quintile sizes obey the ntile head rule.
- graph_degree_histogram: bins tile the vertex set, bin edges respect
  bit-length boundaries, totals match the distinct edge set.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_uplift_recompute(spark, sf_dir):
    rows = REGISTRY["ab_uplift_by_decile"].spark(spark, sf_dir).collect()
    ev = T(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("long").alias("k"),
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n_events, max_k, converted
    for r in ev:
        a = agg[r["user_id"]]
        a[0] += 1
        a[1] = max(a[1], r["k"])
        if r["event_type"] == "purchase":
            a[2] = 1
    users = sorted(agg.items(), key=lambda kv: (-kv[1][0], kv[0]))
    n = len(users)
    q, rem = divmod(n, 5)
    cells = defaultdict(lambda: [0, 0, 0, 0])
    idx = 0
    for tile in range(1, 6):
        size = q + 1 if tile <= rem else q
        for _, (ne, mk, conv) in users[idx: idx + size]:
            c = cells[tile]
            if mk % 2 == 1:
                c[0] += 1
                c[1] += conv
            else:
                c[2] += 1
                c[3] += conv
        idx += size
    assert {r["quintile"] for r in rows} == set(cells)
    for r in rows:
        nt, ct, nc, cc = cells[r["quintile"]]
        assert (r["n_t"], r["c_t"], r["n_c"], r["c_c"]) == (nt, ct, nc, cc)
        if nt > 0:
            assert r["rate_t_milli"] == (2000 * ct + nt) // (2 * nt)
        else:
            assert r["rate_t_milli"] is None
        if nc > 0:
            assert r["rate_c_milli"] == (2000 * cc + nc) // (2 * nc)
        else:
            assert r["rate_c_milli"] is None
        if nt > 0 and nc > 0:
            assert r["uplift_milli"] == r["rate_t_milli"] - r["rate_c_milli"]
    assert sum(r["n_t"] + r["n_c"] for r in rows) == n


def test_degree_histogram_tiles(spark, sf_dir):
    rows = REGISTRY["graph_degree_histogram"].spark(spark, sf_dir).collect()
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    edges = {
        (r["o_custkey"], r["l_partkey"])
        for r in li.join(orders, "l_orderkey").collect()
    }
    deg = defaultdict(int)
    for ck, _ in edges:
        deg[ck] += 1
    for r in rows:
        assert r["total_vertices"] == len(deg)
        assert r["total_edges"] == len(edges)
        lo, hi = r["min_deg"], r["max_deg"]
        assert lo.bit_length() == r["bin_log2"]
        assert hi.bit_length() == r["bin_log2"]
        assert lo <= hi
    assert sum(r["n_vertices"] for r in rows) == len(deg)
    bins = defaultdict(int)
    for d in deg.values():
        bins[d.bit_length()] += 1
    assert {r["bin_log2"]: r["n_vertices"] for r in rows} == dict(bins)
