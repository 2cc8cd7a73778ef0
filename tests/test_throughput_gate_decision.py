"""Pin the throughput gate's decision arithmetic.

r9 recalibration (tools/throughput_gate.py docstring): wall-clock
rows/s classes OVERLAP on this host (same-day healthy-sentinel
measurements — HEAD 293k-816k, pre-fix regressed tree 122k-536k), so
the fine-grained separation moved to the structural persisted-footprint
check (tests/test_merge_persist_footprint.py). The wall floor's job is
now catastrophic breakage only: 250k sits below every healthy reading
ever recorded (min 293k, degraded window) and scales down 1:1 with
sentinel drift so it grades every window instead of skipping."""

from tools.throughput_gate import DEFAULT_FLOOR, decide

HEALTHY_WORST = 293_000.0  # slowest healthy-sentinel HEAD reading (r9)
CATASTROPHIC = 80_000.0  # order-of-magnitude breakage class


def test_healthy_worst_case_passes_at_any_drift():
    for d in (0.6, 1.0, 1.7, 2.33, 4.0):
        passed, eff = decide(HEALTHY_WORST / max(d, 1.0), DEFAULT_FLOOR, d)
        assert passed, f"healthy tree failed at drift {d} (eff floor {eff})"


def test_catastrophic_fails_at_any_drift():
    for d in (0.6, 1.0, 1.7, 2.33, 4.0):
        passed, eff = decide(CATASTROPHIC / max(d, 1.0), DEFAULT_FLOOR, d)
        assert not passed, f"catastrophic tree passed at drift {d} (eff {eff})"


def test_fast_host_still_owes_full_floor():
    # drift < 1 must not RAISE the bar above the calibrated floor, and
    # must not lower it either
    passed, eff = decide(DEFAULT_FLOOR - 1_000, DEFAULT_FLOOR, 0.5)
    assert not passed and eff == DEFAULT_FLOOR
    passed, eff = decide(DEFAULT_FLOOR + 1_000, DEFAULT_FLOOR, 0.5)
    assert passed


def test_effective_floor_scales_inverse_with_drift():
    _, eff = decide(0.0, DEFAULT_FLOOR, 2.0)
    assert eff == DEFAULT_FLOOR / 2.0
