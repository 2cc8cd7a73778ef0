"""Bench-record diff adjudicator (r6 verdict task 7).

Given two BENCH_DETAIL-shaped JSON files (A = older/reference,
B = newer/challenger), list every query whose recorded seconds differ
by more than --ratio (default 1.5x), annotated with BOTH runs' drift
stamps — the round-6 manual adjudication (driver 403 s vs builder
337 s record) as one command. With --retime N, the top N disagreements
are re-timed live, min-of-3 with a stall-sentinel reading bracketing
each query, so "which file was polluted" is answered by measurement,
not argument.

Usage:
  python tools/bench_diff.py A.json B.json [--ratio 1.5] [--retime N]
                             [--sf-dir /root/testdata/sf0.1]

Output: a TSV table to stdout (query, a_sec, a_drift, b_sec, b_drift,
ratio, [retimed_sec, retime_drift, verdict]) + one summary JSON line.
The verdict per re-timed row names the file whose record the clean
re-timing corroborates ("A", "B", or "neither" when the re-time
disagrees >1.5x with both).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_detail(path: str) -> tuple[dict[str, float], dict[str, float]]:
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {}), d.get("query_drift", {})


def disagreements(
    a: dict[str, float], b: dict[str, float], ratio: float
) -> list[tuple[str, float, float, float]]:
    rows = []
    for name in sorted(set(a) & set(b)):
        xa, xb = a[name], b[name]
        if xa is None or xb is None or xa < 0 or xb < 0:
            continue
        r = max(xa, xb) / max(min(xa, xb), 1e-9)
        if r > ratio:
            rows.append((name, xa, xb, round(r, 3)))
    rows.sort(key=lambda t: -t[3] * max(t[1], t[2]))  # impact order
    return rows


def _retime(names: list[str], sf_dir: str) -> dict[str, dict]:
    """Min-of-3 clean re-timing with a sentinel reading after each
    query; a row measured while the host reads drift > 1.3 is retried
    once after a pause and flagged if still dirty.

    Refuses to start while the 1-minute load average exceeds half the
    CPU count: a concurrent workload (measured failure mode: a zombie
    JVM left by a killed prior re-time saturating all cores) inflates
    every reading 3-30x while the in-process sentinel can still read
    plausibly — the numbers would adjudicate the wrong way."""
    load1 = os.getloadavg()[0]
    ncpu = os.cpu_count() or 1
    if load1 > ncpu / 2:
        raise RuntimeError(
            f"host busy (load1={load1:.1f} on {ncpu} CPUs) — another "
            "workload would pollute every re-timing; find and stop it "
            "(stale JVMs from killed Spark runs are the usual culprit) "
            "or wait for load to drain"
        )
    # same fixed sentinel plan and clamp band as bench.py
    from bench import EXPECTED_BASELINE_SEC, _sentinel_sec
    from gravity_spark.queries import REGISTRY
    from gravity_spark.session import get_spark

    spark = get_spark("bench_diff_retime")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    baseline = min(_sentinel_sec(spark) for _ in range(3))
    baseline = min(
        max(baseline, EXPECTED_BASELINE_SEC * 0.9), EXPECTED_BASELINE_SEC * 1.2
    )
    out: dict[str, dict] = {}
    for name in names:
        if name not in REGISTRY:
            out[name] = {"sec": None, "drift": None, "note": "not registered"}
            continue
        for attempt in range(2):
            runs = []
            for _ in range(3):
                t0 = time.time()
                REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in list(jmap.keySet().toArray()):
                    rdd = jmap.get(rid)
                    if rdd is not None:
                        rdd.unpersist(False)
            drift = round(_sentinel_sec(spark) / baseline, 3)
            if drift <= 1.3:
                break
            time.sleep(10)  # stalled window — one more try, clean
        out[name] = {"sec": min(runs), "runs": runs, "drift": drift}
        spark.sparkContext._jvm.System.gc()
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("file_a")
    p.add_argument("file_b")
    p.add_argument("--ratio", type=float, default=1.5)
    p.add_argument("--retime", type=int, default=0)
    p.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = p.parse_args()

    qa, da = load_detail(args.file_a)
    qb, db = load_detail(args.file_b)
    rows = disagreements(qa, qb, args.ratio)

    retimed: dict[str, dict] = {}
    if args.retime > 0 and rows:
        retimed = _retime([r[0] for r in rows[: args.retime]], args.sf_dir)

    hdr = ["query", "a_sec", "a_drift", "b_sec", "b_drift", "ratio"]
    if retimed:
        hdr += ["retimed_sec", "retime_drift", "verdict"]
    print("\t".join(hdr))
    verdicts = {"A": 0, "B": 0, "neither": 0}
    for name, xa, xb, r in rows:
        line = [name, f"{xa:.3f}", str(da.get(name, "?")), f"{xb:.3f}",
                str(db.get(name, "?")), f"{r:.2f}"]
        if name in retimed and retimed[name].get("sec") is not None:
            rt = retimed[name]["sec"]
            close_a = max(xa, rt) / max(min(xa, rt), 1e-9) <= args.ratio
            close_b = max(xb, rt) / max(min(xb, rt), 1e-9) <= args.ratio
            if close_a and close_b:
                v = "A" if abs(xa - rt) <= abs(xb - rt) else "B"
            elif close_a:
                v = "A"
            elif close_b:
                v = "B"
            else:
                v = "neither"
            verdicts[v] += 1
            line += [f"{rt:.3f}", str(retimed[name]["drift"]), v]
        print("\t".join(line))
    print(
        json.dumps(
            {
                "n_common": len(set(qa) & set(qb)),
                "n_disagree": len(rows),
                "ratio_gate": args.ratio,
                "retimed": len(retimed),
                "verdicts": verdicts,
            }
        )
    )


if __name__ == "__main__":
    main()
