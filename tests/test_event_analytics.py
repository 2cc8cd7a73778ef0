"""Invariant tests for the event-analytics battery (§F in queries.py).

The exact-value gate is the DuckDB oracle (tools/check_oracle.py); these
tests pin the *semantic* invariants that an oracle refactor could
silently lose: funnel monotonicity, gap-fill density, z-score symmetry,
and surprisal bounds.
"""

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir)


def test_funnel_is_monotone(spark, sf_dir):
    row = _run("funnel_conversion", spark, sf_dir).collect()[0]
    assert row.n_signup >= row.n_click_after >= row.n_purchase_after > 0


def test_retention_offsets_start_at_zero(spark, sf_dir):
    rows = _run("retention_cohorts", spark, sf_dir).collect()
    offsets = {r.week_offset for r in rows}
    assert min(offsets) == 0
    # every user's first week is offset 0, so offset-0 cohort counts
    # must each be >= any later-offset count for the same cohort
    base = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    for r in rows:
        if r.week_offset > 0:
            assert r.n_users <= base[r.cohort_week]


def test_gapfill_is_dense_and_count_preserving(spark, sf_dir):
    out = _run("events_gapfill", spark, sf_dir)
    spans = (
        out.groupBy("event_type")
        .agg(
            F.min("hour_bucket").alias("lo"),
            F.max("hour_bucket").alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_events").alias("total"),
        )
        .collect()
    )
    from gravity_spark.queries import T

    raw = dict(
        T(spark, sf_dir, "events").groupBy("event_type").count().collect()
    )
    for r in spans:
        assert r.n_rows == r.hi - r.lo + 1  # no holes in the grid
        assert r.total == raw[r.event_type]  # gap rows add zero, not drift


def test_anomaly_zscore_flags_only_extremes(spark, sf_dir):
    rows = _run("events_anomaly_zscore", spark, sf_dir).collect()
    assert rows, "30 days of hourly Poisson-ish counts must have |z|>=2 hours"
    assert all(abs(r.z) >= 2.0 for r in rows)


def test_perplexity_filter_bounds(spark, sf_dir):
    out = _run("perplexity_filter", spark, sf_dir)
    rows = out.collect()
    n_docs = out.sparkSession.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs  # every doc scored
    # surprisal is positive and bounded by -ln(1/total_tokens) in micro units
    assert all(0 < r.avg_surprisal_micro for r in rows)
    assert all((r.keep == 1) == (r.avg_surprisal_micro <= 3_800_000) for r in rows)
