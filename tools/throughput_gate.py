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

Degraded-host policy (r9, replacing the r8 loud skip): at sentinel
drift d the healthy path reads ~918k/d rows/s and the regressed one
~300k/d — the RATIO is drift-invariant, so a floor of ``FLOOR / d``
separates the two classes at any drift, where a fixed floor becomes
arithmetically unclearable above d ≈ 918/500 ≈ 1.8 (a first re-gate of
round 8 failed spuriously at measured drift 2.33, and the r8 skip
bound of 1.7 traded that for a 1.7–1.84 false-negative window where a
genuine regression exited 0 ungraded). The scaled floor grades every
window. Drift is the max of sentinel readings bracketing the attempts
(the probe may hit a slow phase a single pre-read misses); it only
ever LOWERS the floor (d < 1 clamps to 1 — a fast host must still
clear the full floor). Every run appends a machine-readable record
(best/floor/effective_floor/drift/verdict) to THROUGHPUT_GATE.json so
degraded-window grades can be re-audited instead of forgotten
(r8-advisor ask).

Decision arithmetic is in ``decide()`` — pytest pins the separation at
the observed drift points (healthy 918k and regressed 281k at d=2.33,
the exact window that used to skip/spurious-fail):
tests/test_throughput_gate_decision.py.

Usage: python tools/throughput_gate.py [floor_rows_per_sec] [mult]
Exit 0 = best attempt cleared the drift-scaled floor; exit 1 = below
it (a regression at ANY measured drift).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_FLOOR = 500_000.0
DEFAULT_MULT = 200
ATTEMPTS = 3


def decide(best_rps: float, floor: float, drift: float) -> tuple[bool, float]:
    """(passed, effective_floor): the floor scales down 1:1 with host
    drift (measured rates scale the same way, so class separation is
    preserved), never up — a faster-than-band host still owes the full
    floor."""
    effective = floor / max(drift, 1.0)
    return best_rps >= effective, effective


def main() -> int:
    from bench import EXPECTED_BASELINE_SEC, _sentinel_sec
    from gravity_spark.session import get_spark
    from tools.throughput_probe import run_probe

    FLOOR = float(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_FLOOR
    MULT = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_MULT

    spark = get_spark("throughput_gate")
    spark.sparkContext.setLogLevel("ERROR")
    drifts = [_sentinel_sec(spark) / EXPECTED_BASELINE_SEC]
    best = 0.0
    for i in range(ATTEMPTS):
        res = run_probe(spark, "/root/testdata/sf0.1", MULT)
        rps = res["value"]
        best = max(best, rps)
        print(
            f"attempt {i + 1}/{ATTEMPTS}: {rps:,.0f} rows/s "
            f"({res['input_rows']:,} rows in {res['elapsed_sec']}s)",
            flush=True,
        )
        if rps >= FLOOR:
            break  # full floor cleared — no more attempts needed
        drifts.append(_sentinel_sec(spark) / EXPECTED_BASELINE_SEC)
    drift = max(drifts)
    passed, effective = decide(best, FLOOR, drift)
    record = {
        "gate": "cdc_throughput_floor",
        "best_rows_per_sec": round(best),
        "floor": round(FLOOR),
        "effective_floor": round(effective),
        "sentinel_drift": round(drift, 3),
        "mult": MULT,
        "verdict": "pass" if passed else "fail",
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "THROUGHPUT_GATE.json"), "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps(record))
    if passed:
        print(
            f"THROUGHPUT GATE: pass ({best:,.0f} >= {effective:,.0f} rows/s"
            + (
                f"; floor drift-scaled {FLOOR:,.0f}/{drift:.2f}x)"
                if effective < FLOOR
                else ")"
            )
        )
        return 0
    print(
        f"THROUGHPUT GATE: FAIL — best {best:,.0f} < drift-scaled floor "
        f"{effective:,.0f} rows/s (raw floor {FLOOR:,.0f}, sentinel "
        f"{drift:.2f}x) — a regression at any measured drift"
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
