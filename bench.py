"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf"}.

Each query is materialized with the noop sink (full execution, no
driver-side collect overhead).

Stall sentinel: this host shows intermittent multi-10s stalls (same
plan measured 3.5 s and 86 s minutes apart, ~zero steal/pressure
in-guest; round 4's committed BENCH_DETAIL carried rows up to 7×
reality because of one). A FIXED tiny plan is timed at session start
(baseline = min of 3) and re-timed every ~20 queries; each query row
is stamped with the drift (sentinel/baseline) of its measurement
window, the sentinel series lands in the detail file, and when the
MEDIAN drift exceeds 1.2× the run refuses to overwrite
BENCH_DETAIL.json (the polluted detail goes to
BENCH_DETAIL_STALLED.json and stdout carries stall_median_drift) — a
stall can no longer masquerade as a regression record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gravity_spark.session import get_spark  # noqa: E402
from gravity_spark.queries import REGISTRY  # noqa: E402


SENTINEL_EVERY = 20  # queries between sentinel re-timings
# Healthy-host sentinel cost: ~0.5-0.6 s observed across clean rounds
# (r5 record: 0.579). If the session-start baseline itself exceeds
# 3x this, the host is ALREADY stalled during baseline capture — an
# inflated baseline would make every later drift read artificially low
# and let a polluted run pass the median<=1.2 gate, the exact failure
# the sentinel exists to prevent.
EXPECTED_BASELINE_SEC = 0.6
BASELINE_STALL_FACTOR = 3.0


def _sentinel_sec(spark) -> float:
    """One fixed, tiny, deterministic plan: a codegen'd fold plus a
    32-key shuffle — representative of both cost classes, ~0.5-0.6 s on
    a healthy host (recorded clean-round baselines: 0.571-0.579).
    Timing THIS is timing the host, not the queries."""
    t0 = time.time()
    spark.range(2_000_000).selectExpr(
        "sum(id * 3 + 1) AS a", "count(1) AS b"
    ).collect()
    (
        spark.range(200_000)
        .selectExpr("id % 32 AS k")
        .groupBy("k").count()
        .selectExpr("sum(count)")
        .collect()
    )
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gravity_spark_bench")

    # session warmup: JVM/codegen/parquet-footer costs paid once, not
    # attributed to the first measured query
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # two timed runs per query, report the min: first-run JIT/codegen
    # noise (observed 1.6s vs 10.7s for identical plans) would otherwise
    # dominate the signal. The host also shows intermittent multi-10s
    # stalls (same plan measured 3.5s and 86s minutes apart, ~zero
    # steal/pressure in-guest) — when the two runs disagree by >1.5x the
    # query gets up to two extra runs so one stall can't poison its min.
    # sentinel baseline: min of 3 on the (hopefully) healthy session —
    # with an ABSOLUTE sanity bound: a baseline captured during a stall
    # would deflate every later drift reading, so re-take once after a
    # pause, and if still inflated mark the whole run baseline-stalled
    baseline_raw = min(_sentinel_sec(spark) for _ in range(3))
    baseline_stalled = False
    if baseline_raw > EXPECTED_BASELINE_SEC * BASELINE_STALL_FACTOR:
        print(
            f"bench: startup baseline {baseline_raw:.2f}s > "
            f"{EXPECTED_BASELINE_SEC * BASELINE_STALL_FACTOR:.1f}s sanity "
            "bound — host may be stalled; re-taking baseline in 15s",
            file=sys.stderr,
        )
        time.sleep(15)
        baseline_raw = min(_sentinel_sec(spark) for _ in range(3))
        if baseline_raw > EXPECTED_BASELINE_SEC * BASELINE_STALL_FACTOR:
            baseline_stalled = True  # informational: start was stalled twice
    # The sentinel is a FIXED plan on fixed hardware, so its healthy
    # cost is a stable band (observed 0.49-0.66 across rounds). Clamp
    # the drift divisor to that band: a baseline captured in a startup
    # stall would DEFLATE every drift reading (the run passes while
    # polluted — observed 1.698), a lucky sub-band baseline would
    # INFLATE them (a clean 365 s run got quarantined at drift 1.28 —
    # also observed). Clamped, the drift gate is absolute-anchored and
    # the median<=1.2 check means what it says in both directions.
    baseline = min(
        max(baseline_raw, EXPECTED_BASELINE_SEC * 0.9),
        EXPECTED_BASELINE_SEC * 1.2,
    )
    sentinels: list[dict] = []
    current_drift = 1.0

    def take_sentinel(idx: int) -> None:
        nonlocal current_drift
        s = _sentinel_sec(spark)
        current_drift = round(s / max(baseline, 1e-9), 3)
        sentinels.append(
            {"after_query": idx, "sec": round(s, 3), "drift": current_drift}
        )

    timings: dict[str, float] = {}
    query_drift: dict[str, float] = {}
    retry_budget = 60  # global cap on extra runs: a long stall period
    # must not quadruple the whole gate's wall time
    q_idx = 0
    for name, qd in REGISTRY.items():
        best = None
        runs: list[float] = []
        attempt = 0
        max_attempts = 4 if retry_budget > 0 else 2
        while attempt < max_attempts:
            attempt += 1
            t0 = time.time()
            try:
                qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
                elapsed = round(time.time() - t0, 3)
                runs.append(elapsed)
                best = elapsed if best is None else min(best, elapsed)
                # converged when the two BEST runs agree (the first run
                # legitimately pays JIT/codegen once — judge it by
                # whether a second-best run corroborates the min)
                two_best = sorted(runs)[:2]
                if len(runs) >= 2 and (
                    best < 0.5 or two_best[1] / max(best, 1e-9) <= 1.5
                ):
                    break
                if len(runs) >= 2:
                    retry_budget -= 1  # an extra (3rd+) run is coming
            except Exception as e:  # a failing query shows as -1, not a crash
                print(f"bench error in {name}: {e}", file=sys.stderr)
                best = -1.0
                break
            finally:
                spark.catalog.clearCache()  # queries persist intermediates
                # localCheckpoint blocks are RDD-level, invisible to
                # clearCache — free them so one query's state can't
                # push a later query's sort into spill
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in list(jmap.keySet().toArray()):
                    rdd = jmap.get(rid)
                    if rdd is not None:
                        rdd.unpersist(False)
        timings[name] = best
        query_drift[name] = current_drift  # drift of this window
        q_idx += 1
        if q_idx % SENTINEL_EVERY == 0:
            take_sentinel(q_idx)
        # late-run JVM heap pressure swings iterative queries up to 4×
        # (BASELINE.md §4); a GC nudge between queries keeps the tail of
        # a 160+-query run from paying earlier queries' garbage
        spark.sparkContext._jvm.System.gc()

    take_sentinel(q_idx)  # closing sentinel

    # Post-pass: a stall WINDOW can pass the median<=1.2 gate yet leave
    # its rows 2-16x reality (observed: a drift-5.4 window turned a
    # 0.16 s query into a 2.6 s record row). Rows stamped with window
    # drift > 1.4 get one end-of-run re-timing each, taken only while
    # the host measures healthy; min() with the existing best means a
    # re-run can only improve a row, never worsen it.
    suspects = [
        n for n, d in query_drift.items() if d > 1.4 and timings.get(n, -1) >= 0
    ]
    for name in suspects[:80]:
        s = _sentinel_sec(spark)
        drift_now = round(s / max(baseline, 1e-9), 3)
        if drift_now > 1.2:
            break  # host stalled again — keep what we have
        try:
            t0 = time.time()
            REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = round(time.time() - t0, 3)
            if elapsed < timings[name]:
                timings[name] = elapsed
                query_drift[name] = drift_now
        except Exception as e:
            print(f"bench repass error in {name}: {e}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                rdd = jmap.get(rid)
                if rdd is not None:
                    rdd.unpersist(False)
            spark.sparkContext._jvm.System.gc()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    drifts = sorted(s["drift"] for s in sentinels)
    median_drift = drifts[len(drifts) // 2] if drifts else 1.0
    # the clamped baseline makes median drift absolute-anchored, so it
    # is the sole gate; baseline_stalled stays recorded as metadata
    stalled = median_drift > 1.2
    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_drift": query_drift,
        "sentinel_baseline_sec": round(baseline, 3),
        "sentinel_baseline_raw_sec": round(baseline_raw, 3),
        "baseline_stalled": baseline_stalled,
        "sentinels": sentinels,
        "median_drift": median_drift,
        "sf": sf_val,
    }
    # Per-query detail goes to stderr + a sidecar file; stdout ends with a
    # SHORT single JSON line so the driver's tail capture can parse it
    # (round 1 had "parsed": null — the 132-query line was head-truncated).
    print(json.dumps(detail), file=sys.stderr)
    here = os.path.dirname(os.path.abspath(__file__))
    if stalled:
        # REFUSE to let a stall-polluted run overwrite the per-query
        # record — the last clean BENCH_DETAIL.json stands; the
        # polluted detail is preserved for inspection
        detail_name = "BENCH_DETAIL_STALLED.json"
        print(
            f"bench: median sentinel drift {median_drift} > 1.2 — "
            f"writing {detail_name}, keeping prior BENCH_DETAIL.json",
            file=sys.stderr,
        )
    else:
        detail_name = "BENCH_DETAIL.json"
    with open(os.path.join(here, detail_name), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "n_failed": sum(1 for t in timings.values() if t < 0),
                "stall_median_drift": median_drift,
                "queries_detail": detail_name,
            }
        )
    )


if __name__ == "__main__":
    main()
