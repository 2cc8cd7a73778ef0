"""CDC apply-path throughput floor — round-gate regression guard.

Round 7's only real regression (the merge sink silently persisting the
raw batch instead of the collapsed frame, cutting 200×-scale apply
throughput from ~1.36M to ~300k rows/s) was caught only because the
BASELINE §5 probe happened to be re-run by hand. This gate makes that
probe a standing check: the 20M-row configuration (sf0.1 events ×200)
must clear a floor chosen to separate the healthy path (~900k rows/s
clean at 200×) from the regressed one (~300–420k) with margin for host
noise on both sides — at 50× the raw-persist regression only drops
throughput to ~416k (measured), too close to any floor that the
healthy path clears under noise, so the gate pays the larger batch.

Policy on this host (timings oscillate 3–6×, see PLANS bench notes):
up to 3 attempts, pass on the FIRST that clears the floor (min-of-N
semantics — host noise only ever slows a run down). If every attempt
fails AND either the pre- or post-attempt host sentinel reads degraded
(>1.7× the healthy band), the gate SKIPS loudly instead of failing —
a degraded-host skip is recorded in the transcript and the next
clean-window gate re-checks. The 1.7 bound is arithmetic, not taste:
the healthy path (~918k rows/s clean) reads 918k/d at drift d, so any
d > 918/500 ≈ 1.8 makes a fixed 500k floor unclearable even with no
regression — a first re-gate of round 8 failed spuriously at measured
drift 2.33 under the old 2.5 skip bound.

Usage: python tools/throughput_gate.py [floor_rows_per_sec] [mult]
Exit 0 = pass or loud host-degraded skip; exit 1 = confirmed below
floor on a healthy host.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOOR = float(sys.argv[1]) if len(sys.argv) > 1 else 500_000.0
MULT = int(sys.argv[2]) if len(sys.argv) > 2 else 200
ATTEMPTS = 3
SENTINEL_DEGRADED = 1.7  # × healthy band; see module docstring


def main() -> int:
    from bench import EXPECTED_BASELINE_SEC, _sentinel_sec
    from gravity_spark.session import get_spark
    from tools.throughput_probe import run_probe

    spark = get_spark("throughput_gate")
    spark.sparkContext.setLogLevel("ERROR")
    drift_pre = _sentinel_sec(spark) / EXPECTED_BASELINE_SEC
    best = None
    for i in range(ATTEMPTS):
        res = run_probe(spark, "/root/testdata/sf0.1", MULT)
        rps = res["value"]
        best = max(best or 0.0, rps)
        print(
            f"attempt {i + 1}/{ATTEMPTS}: {rps:,.0f} rows/s "
            f"({res['input_rows']:,} rows in {res['elapsed_sec']}s)",
            flush=True,
        )
        if rps >= FLOOR:
            print(f"THROUGHPUT GATE: pass ({rps:,.0f} >= {FLOOR:,.0f} rows/s)")
            return 0
    drift = max(drift_pre, _sentinel_sec(spark) / EXPECTED_BASELINE_SEC)
    if drift > SENTINEL_DEGRADED:
        print(
            f"THROUGHPUT GATE: SKIPPED — host degraded (sentinel {drift:.2f}x "
            f"healthy band) and best attempt {best:,.0f} < floor "
            f"{FLOOR:,.0f} rows/s; re-run in a clean window"
        )
        return 0
    print(
        f"THROUGHPUT GATE: FAIL — best {best:,.0f} < floor {FLOOR:,.0f} "
        f"rows/s on a healthy host (sentinel {drift:.2f}x)"
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
