"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf"}.

Each query is materialized with the noop sink (full execution, no
driver-side collect overhead). Queries run in REGISTRY registration
order — stable across rounds regardless of the driver-window rotation
(which lives only in queries()/oracle_sql() ordering), so per-query
BENCH_DETAIL records stay comparable round over round.

Stall sentinel: this host shows intermittent multi-10s stalls (same
plan measured 3.5 s and 86 s minutes apart, ~zero steal/pressure
in-guest; round 4's committed BENCH_DETAIL carried rows up to 7×
reality because of one). A FIXED tiny plan is timed at session start
(baseline = min of 3) and re-timed every ~20 queries; each query row
is stamped with the drift of its measurement window, the sentinel
series lands in the detail file, and when the median drift exceeds
the gate the run refuses to overwrite BENCH_DETAIL.json (the polluted
detail goes to BENCH_DETAIL_STALLED.json and stdout carries
stall_median_drift) — a stall can no longer masquerade as a
regression record.

Round-7 hardening (r6 verdict task 5 + advisor items):

- SUB-WINDOW BLIND SPOT CLOSED: a stall shorter than the 20-query
  sentinel window used to stamp its rows with a clean drift (r6's
  driver run: 2.3× rows stamped 0.96). Now any query whose timed runs
  disagree >1.5× triggers an immediate post-hoc sentinel reading and
  the row is stamped with the WORSE of window/post-hoc drift, so the
  end-of-run repass re-times exactly the rows a mid-window stall
  touched. Post-hoc readings are recorded separately and EXCLUDED
  from the median gate (they are adversely sampled — conditioned on
  disagreement — and would bias the run-health median).
- DUAL-ANCHORED DRIFT GATE: drift is measured against BOTH the
  clamped absolute band (catches a baseline captured during a startup
  stall, which would deflate every later reading) and the raw
  session baseline (catches a genuinely-faster host where the clamp
  itself would deflate a real 2× stall to ~1.1). Gate: median
  absolute drift > 1.2 OR median relative drift > 1.35 (the wider
  relative gate absorbs honest baseline variance — a lucky 0.49 s
  baseline once quarantined a clean 365 s run at rel 1.28). A
  baseline outside the expected band warns loudly instead of
  clamping silently.
- REPASS FAIRNESS: repass rows get the same two-run agreement rule
  as the main loop, and any row the repass repaired carries
  "retimed": true in BENCH_DETAIL so cross-round comparisons can
  account for the warmer measurement conditions.
- SENTINEL-BLIND SLOW PHASES: the host has a degradation mode the
  tiny fixed sentinel does not share (observed: sentinels 0.49 s —
  healthy — while unrelated queries ran 1.5-3x their prior record
  for most of a pass; min-of-3 re-times corroborated the priors).
  Every disagreement/regression suspect is therefore queued for the
  repass even when its post-hoc sentinel read clean; min() with the
  existing best repairs host noise and re-confirms genuine code
  regressions at their honest number.

Round-9 hardening (r8 verdict task 1): the committed TOTAL is now
defensible across rounds. A MACRO-sentinel (one real micro-batch epoch
+ one small shuffled parquet write — the fixed costs the tiny plan
misses and the heavy tail pays) is timed min-of-3 at session start
(after a throwaway warm-up) and once at close; the record carries the
readings, the session floor, its drift vs the pinned clean-window
healthy floor (MACRO_HEALTHY_SEC), and `value_normalized = value /
floor-drift`. Cross-round comparisons of an unchanged registry should
read value_normalized; BASELINE §13 pins the honest TOTAL band.

The measurement policy lives in BenchEngine with injectable
run-query/sentinel callables — tests/test_bench_engine.py injects a
synthetic mid-window stall and asserts its rows get flagged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


SENTINEL_EVERY = 20  # queries between sentinel re-timings
# Healthy-host sentinel cost: ~0.5-0.6 s observed across clean rounds
# (r5 record: 0.579; observed clean band 0.49-0.66). The clamp anchors
# the ABSOLUTE drift reading; the RAW baseline anchors the relative
# one — the gate consults both (module docstring).
EXPECTED_BASELINE_SEC = 0.6
BASELINE_STALL_FACTOR = 3.0
ABS_DRIFT_GATE = 1.2
REL_DRIFT_GATE = 1.35
DISAGREE_RATIO = 1.5  # two best runs farther apart than this = suspect
SUSPECT_DRIFT = 1.4  # stamped drift above this = repass candidate


# Clean-window macro-sentinel floor: session minima 2.53/2.87 s across
# two r9 sessions bracketed by healthy tiny sentinels (0.92-1.0x);
# in-session band up to ~4 s (micro-batch scheduling jitter).
# Pinned at the low edge so a mis-pin UNDER-normalizes (normalized
# total stays close to raw — the conservative error direction).
# The macro plan exercises the cost classes the tiny sentinel is blind
# to — micro-batch epoch planning + checkpoint commits, job-scheduling/
# commit latency of a small shuffled parquet write — which dominate the
# heavy streaming/CDC tail of the registry.
# r6→r8 committed totals drifted 337.7→495.9 s on an unchanged registry
# while every tiny-sentinel median read healthy; this floor is what
# lets a future round tell host drift from code drift from the record
# alone (r8 verdict task 1).
MACRO_HEALTHY_SEC = 2.6


def _macro_sentinel_sec(spark) -> float:
    """One REAL micro-batch epoch (file stream -> agg -> memory sink,
    availableNow, checkpointed) plus one small shuffled parquet write.
    Timing THIS times the session's fixed streaming/job overhead — the
    component of the heavy bench rows that the tiny codegen'd-fold
    sentinel does not share (observed: tiny sentinels healthy while
    epoch-bound rows ran 1.5-3x their records)."""
    import shutil
    import tempfile
    import uuid

    t0 = time.time()
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="bench_macro_", dir=base)
    try:
        (
            spark.range(200_000)
            .selectExpr("id % 97 AS k", "id AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .write.mode("overwrite")
            .parquet(f"{d}/out")
        )
        src = f"{d}/stream"
        os.makedirs(src)
        with open(f"{src}/000.json", "w") as f:
            f.write('{"a": 1}\n{"a": 2}\n')
        name = f"macro_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema("a long")
            .json(src)
            .groupBy("a")
            .count()
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise RuntimeError("macro sentinel stream timed out")
        spark.catalog.dropTempView(name)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return time.time() - t0


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


class BenchEngine:
    """Measurement policy, decoupled from Spark so a test can inject a
    synthetic stall. ``run_query(name) -> seconds`` (raises on query
    error), ``sentinel() -> seconds``; both are called exactly as the
    real bench would."""

    def __init__(
        self,
        run_query,
        sentinel,
        baseline_raw: float,
        *,
        sentinel_every: int = SENTINEL_EVERY,
        retry_budget: int = 60,
        repass_cap: int = 80,
        prior: dict[str, float] | None = None,
    ):
        self.run_query = run_query
        self.sentinel = sentinel
        # prior clean per-query records: a row regressing >DISAGREE_RATIO
        # vs its prior ALSO triggers the post-hoc sentinel — a SUSTAINED
        # sub-window stall inflates both runs equally (they agree, so
        # disagreement alone misses it; r6's driver run stamped 2.3×
        # rows with drift 0.96 exactly this way), but it can't fool the
        # prior anchor. A genuine code regression flags once, reads a
        # healthy post-hoc sentinel, and keeps its honest number.
        self.prior = prior or {}
        self.baseline_raw = max(baseline_raw, 1e-9)
        # absolute anchor: the sentinel is a FIXED plan on fixed
        # hardware, so its healthy cost is a stable band; clamping the
        # absolute divisor keeps a stall-inflated baseline from
        # deflating every later reading
        self.baseline_abs = min(
            max(baseline_raw, EXPECTED_BASELINE_SEC * 0.9),
            EXPECTED_BASELINE_SEC * 1.2,
        )
        self.sentinel_every = sentinel_every
        self.retry_budget = retry_budget
        self.repass_cap = repass_cap
        self.timings: dict[str, float] = {}
        self.query_drift: dict[str, float] = {}
        self.retimed: dict[str, bool] = {}
        self.sentinels: list[dict] = []
        self.posthoc_sentinels: list[dict] = []
        self.errors: list[str] = []
        self.suspects: set[str] = set()
        self._current_drift = 1.0
        # optional macro-sentinel sampling: the session-floor estimate
        # is a MIN, so it only converges with enough samples — 4
        # endpoint readings once all landed in slow moments (floor
        # 1.451) while the run's raw total matched a clean session's,
        # over-normalizing the record by 1.45x. In-run readings every
        # ``macro_every`` queries (~4 extra over a full registry, ~3 s
        # each) bound that estimator error.
        self.macro_sentinel = None
        self.macro_every = 60
        self.macro_inrun: list[float] = []

    def _drifts(self, sec: float) -> tuple[float, float]:
        return (
            round(sec / self.baseline_abs, 3),
            round(sec / self.baseline_raw, 3),
        )

    def _take_sentinel(self, after, posthoc: bool = False) -> float:
        s = self.sentinel()
        d_abs, d_rel = self._drifts(s)
        worst = max(d_abs, d_rel)
        rec = {
            "after_query": after,
            "sec": round(s, 3),
            "drift": d_abs,
            "drift_rel": d_rel,
        }
        if posthoc:
            # adversely sampled (taken because runs disagreed) —
            # recorded for the repass trigger, excluded from the
            # run-health median
            self.posthoc_sentinels.append(rec)
        else:
            self.sentinels.append(rec)
            self._current_drift = worst
        return worst

    def _measure(self, name: str, max_attempts: int) -> tuple[float, bool]:
        """One query: up to max_attempts timed runs, min kept; returns
        (best_sec, disagreed). disagreed = an extra run was needed or
        the two best runs never came within DISAGREE_RATIO — either
        means the host may have stalled inside this window."""
        runs: list[float] = []
        best = None
        disagreed = False
        attempt = 0
        while attempt < max_attempts:
            attempt += 1
            elapsed = self.run_query(name)
            runs.append(elapsed)
            best = elapsed if best is None else min(best, elapsed)
            two_best = sorted(runs)[:2]
            if len(runs) >= 2 and (
                best < 0.5 or two_best[1] / max(best, 1e-9) <= DISAGREE_RATIO
            ):
                break
            if len(runs) >= 2:
                disagreed = True
                self.retry_budget -= 1
        if len(runs) >= 2:
            two_best = sorted(runs)[:2]
            if best >= 0.5 and two_best[1] / max(best, 1e-9) > DISAGREE_RATIO:
                disagreed = True
        return best, disagreed

    def run(self, names) -> None:
        q_idx = 0
        for name in names:
            max_attempts = 4 if self.retry_budget > 0 else 2
            try:
                best, disagreed = self._measure(name, max_attempts)
            except Exception as e:  # failing query shows as -1, not a crash
                self.errors.append(f"bench error in {name}: {e}")
                self.timings[name] = -1.0
                self.query_drift[name] = self._current_drift
                q_idx += 1
                continue
            self.timings[name] = best
            drift = self._current_drift
            p = self.prior.get(name)
            regressed = (
                p is not None and p > 0 and best >= 0.5
                and best / p > DISAGREE_RATIO
            )
            if disagreed or regressed:
                # sub-window stall suspect: read the host NOW and stamp
                # the row with the worse of window/post-hoc drift so
                # the repass sees it even if the 20-query sentinel
                # window reads clean. The row is ALSO queued for the
                # repass unconditionally: a sustained slow phase can
                # leave every sentinel healthy while real queries run
                # 1.5-3x (observed — the tiny fixed plan does not share
                # the degradation mode), and min() with the existing
                # best means a re-time can only repair host noise, not
                # erase a genuine code regression (the re-run confirms
                # those at their honest slow number).
                drift = max(drift, self._take_sentinel(name, posthoc=True))
                self.suspects.add(name)
            self.query_drift[name] = drift
            q_idx += 1
            if q_idx % self.sentinel_every == 0:
                self._take_sentinel(q_idx)
            if self.macro_sentinel is not None and q_idx % self.macro_every == 0:
                self.macro_inrun.append(round(self.macro_sentinel(), 3))
        self._take_sentinel(q_idx)  # closing sentinel

    def repass(self) -> None:
        """Re-time suspect rows (stamped drift > SUSPECT_DRIFT) while
        the host reads healthy. Same two-run agreement rule as the
        main loop (advisor: a single warm re-run measured repaired
        rows under systematically friendlier conditions); min() with
        the existing best, so a re-run can only improve a row. Rows
        actually repaired carry retimed=True in the detail record."""
        suspects = [
            n
            for n, d in self.query_drift.items()
            if (d > SUSPECT_DRIFT or n in self.suspects)
            and self.timings.get(n, -1) >= 0
        ]
        # worst stamped drift first: if the repass budget runs out, the
        # most stall-implicated rows were re-timed
        suspects.sort(key=lambda n: -self.query_drift.get(n, 0.0))
        for name in suspects[: self.repass_cap]:
            s = self.sentinel()
            d_abs, d_rel = self._drifts(s)
            if max(d_abs, d_rel) > ABS_DRIFT_GATE:
                break  # host stalled again — keep what we have
            try:
                best, _ = self._measure(name, 3)
            except Exception as e:
                self.errors.append(f"bench repass error in {name}: {e}")
                continue
            if best < self.timings[name]:
                self.timings[name] = best
                self.query_drift[name] = max(d_abs, d_rel)
                self.retimed[name] = True

    def median_drifts(self) -> tuple[float, float]:
        if not self.sentinels:
            return 1.0, 1.0
        d_abs = sorted(s["drift"] for s in self.sentinels)
        d_rel = sorted(s["drift_rel"] for s in self.sentinels)
        return d_abs[len(d_abs) // 2], d_rel[len(d_rel) // 2]

    @property
    def stalled(self) -> bool:
        m_abs, m_rel = self.median_drifts()
        return m_abs > ABS_DRIFT_GATE or m_rel > REL_DRIFT_GATE


def floor_sentinel_disagreement(
    session_floor_drift: float, median_drift: float
) -> bool:
    """True when the macro session floor and the tiny-sentinel median
    disagree materially about host health (BASELINE §13 trust rule,
    mechanized). Both estimators are clamped at 1.0 — sub-1 readings
    mean "healthy", not disagreement — and the same ABS_DRIFT_GATE
    ratio that quarantines a stalled run decides "materially"."""
    a = max(session_floor_drift, 1.0)
    b = max(median_drift, 1.0)
    return max(a, b) / min(a, b) > ABS_DRIFT_GATE


def main() -> None:
    from gravity_spark.session import get_spark
    from gravity_spark.queries import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    spark = get_spark("gravity_spark_bench")

    # session warmup: JVM/codegen/parquet-footer costs paid once, not
    # attributed to the first measured query
    spark.range(1_000_000).selectExpr("sum(id)").collect()

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
    if not (
        EXPECTED_BASELINE_SEC * 0.9 <= baseline_raw <= EXPECTED_BASELINE_SEC * 1.2
    ):
        # loud, not silent: outside the band the absolute and relative
        # anchors disagree — the dual gate handles it, but the operator
        # should know which anchor is live
        print(
            f"bench: raw baseline {baseline_raw:.3f}s outside expected band "
            f"[{EXPECTED_BASELINE_SEC * 0.9:.2f}, "
            f"{EXPECTED_BASELINE_SEC * 1.2:.2f}] — absolute drift uses the "
            "clamped band; relative drift uses this raw value; the stall "
            "gate consults both",
            file=sys.stderr,
        )

    def run_query(name: str) -> float:
        t0 = time.time()
        try:
            REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.time() - t0, 3)
        finally:
            spark.catalog.clearCache()  # queries persist intermediates
            # localCheckpoint blocks are RDD-level, invisible to
            # clearCache — free them so one query's state can't push a
            # later query's sort into spill
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                rdd = jmap.get(rid)
                if rdd is not None:
                    rdd.unpersist(False)
            # late-run JVM heap pressure swings iterative queries up to
            # 4× (BASELINE.md §4); a GC nudge between runs keeps the
            # tail of a 292-query pass from paying earlier garbage
            spark.sparkContext._jvm.System.gc()

    prior: dict[str, float] = {}
    here0 = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here0, "BENCH_DETAIL.json")) as f:
            prior_detail = json.load(f)
        # the prior anchor only makes sense at the SAME scale factor —
        # a cross-SF prior would read every row as a regression (or
        # mask all of them) and fire a post-hoc sentinel per query
        if prior_detail.get("sf") == sf_val:
            prior = {
                k: v
                for k, v in prior_detail.get("queries", {}).items()
                if isinstance(v, (int, float)) and v > 0
            }
    except (OSError, ValueError):
        pass

    # SPARK_GRAFT_BENCH_ONLY=name1,name2 runs a subset (smoke runs and
    # targeted re-timings); a subset's detail goes to a SIDECAR file so
    # it can never clobber the full-registry record
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    names = list(REGISTRY)
    subset = False
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        missing = [n for n in wanted if n not in REGISTRY]
        if missing:
            raise KeyError(f"SPARK_GRAFT_BENCH_ONLY names not registered: {missing}")
        names = wanted
        subset = True

    # macro-sentinel session floor: one throwaway (first-epoch codegen /
    # stream-planning warm-up belongs to the session, not the floor),
    # then min-of-3 at start + one closing reading. The FLOOR (min of
    # all readings) estimates the best this host would let the heavy
    # epoch-bound rows run at any point in the session; the normalized
    # total divides the raw total by floor drift so cross-round
    # comparisons of an unchanged registry read the CODE, not the host.
    _macro_sentinel_sec(spark)  # throwaway warm-up
    macro_runs = [round(_macro_sentinel_sec(spark), 3) for _ in range(3)]

    eng = BenchEngine(
        run_query, lambda: _sentinel_sec(spark), baseline_raw, prior=prior
    )
    eng.macro_sentinel = lambda: _macro_sentinel_sec(spark)
    eng.run(names)
    eng.repass()
    macro_runs.extend(eng.macro_inrun)
    macro_runs.append(round(_macro_sentinel_sec(spark), 3))
    session_floor = min(macro_runs)
    # drift < 1 clamps to 1: a faster-than-band host must not inflate
    # the normalized record
    session_floor_drift = round(max(session_floor / MACRO_HEALTHY_SEC, 1.0), 3)
    for msg in eng.errors:
        print(msg, file=sys.stderr)

    timings = eng.timings
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    total_normalized = round(total / session_floor_drift, 3)
    median_drift, median_drift_rel = eng.median_drifts()
    # BASELINE §13 trust rule, mechanized (r9-advisor ask): the macro
    # session floor and the tiny-sentinel median watch the same host;
    # when they disagree materially, neither estimator alone is
    # trustworthy — the min-of-readings floor can land in a clean
    # moment of a degraded window (r9 driver: floor 1.0, median 1.457)
    # or over-correct a healthy one (r9 gate-2: floor 1.451, median
    # ~1.0). Stamp the record so readers adjudicate instead of trusting
    # value_normalized blindly.
    floor_sentinel_disagree = floor_sentinel_disagreement(
        session_floor_drift, median_drift
    )
    if floor_sentinel_disagree:
        print(
            f"bench: session floor drift {session_floor_drift} disagrees "
            f"with tiny-sentinel median {median_drift} — treat "
            f"value_normalized with suspicion (BASELINE §13 trust rule)",
            file=sys.stderr,
        )
    stalled = eng.stalled
    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "value_normalized": total_normalized,
        "macro_sentinels": macro_runs,
        "macro_healthy_sec": MACRO_HEALTHY_SEC,
        "session_floor_sec": session_floor,
        "session_floor_drift": session_floor_drift,
        "floor_sentinel_disagree": floor_sentinel_disagree,
        "unit": "sec",
        "queries": timings,
        "query_drift": eng.query_drift,
        "retimed": eng.retimed,
        # rows whose runs disagreed or regressed vs the prior record —
        # every one was repass-eligible; retimed ∖ suspects = drift-
        # stamped rows, suspects ∖ retimed = re-timed but CONFIRMED at
        # (or above) their recorded number
        "suspects": sorted(eng.suspects),
        "sentinel_baseline_sec": round(eng.baseline_abs, 3),
        "sentinel_baseline_raw_sec": round(baseline_raw, 3),
        "baseline_stalled": baseline_stalled,
        "sentinels": eng.sentinels,
        "posthoc_sentinels": eng.posthoc_sentinels,
        "median_drift": median_drift,
        "median_drift_rel": median_drift_rel,
        "sf": sf_val,
    }
    # Per-query detail goes to stderr + a sidecar file; stdout ends with a
    # SHORT single JSON line so the driver's tail capture can parse it
    # (round 1 had "parsed": null — the 132-query line was head-truncated).
    print(json.dumps(detail), file=sys.stderr)
    # r10 verdict task 2: the driver could not do per-query perf
    # comparison because per-query seconds lived only in the sidecar
    # file. Print the FULL contract line ({"metric","value","unit",
    # "queries","sf"}) as the PENULTIMATE stdout line: a consumer that
    # reads whole stdout gets per-query seconds straight from the
    # bench's own output, while the final line stays short so a
    # fixed-size tail capture still parses the total (putting the
    # 292-entry map on the LAST line is exactly round 1's
    # head-truncation failure). Additions only — timed actions, query
    # set, and the short final line are unchanged.
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    here = os.path.dirname(os.path.abspath(__file__))
    if subset:
        detail_name = "BENCH_DETAIL_SUBSET.json"
    elif stalled:
        # REFUSE to let a stall-polluted run overwrite the per-query
        # record — the last clean BENCH_DETAIL.json stands; the
        # polluted detail is preserved for inspection
        detail_name = "BENCH_DETAIL_STALLED.json"
        print(
            f"bench: median sentinel drift abs={median_drift} "
            f"rel={median_drift_rel} exceeds gate "
            f"(abs>{ABS_DRIFT_GATE} or rel>{REL_DRIFT_GATE}) — "
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
                "value_normalized": total_normalized,
                "session_floor_drift": session_floor_drift,
                "floor_sentinel_disagree": floor_sentinel_disagree,
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
