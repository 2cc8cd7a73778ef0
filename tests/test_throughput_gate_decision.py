"""Pin the throughput gate's drift-scaled decision arithmetic at the
exact drift points the r8 policy mishandled (tools/throughput_gate.py
docstring): the healthy path (~918k rows/s clean) and the regressed
pre-fix path (~281k clean, the r7 raw-persist bug) scale ~1:1 with host
drift, so a floor of 500k/d must separate them at ANY drift — including
d=2.33 (the measured window where a fixed floor spurious-failed and the
r8 1.7x skip bound would have graded nothing)."""

from tools.throughput_gate import decide

HEALTHY_CLEAN = 918_000.0
REGRESSED_CLEAN = 281_000.0  # worst (fastest) pre-fix measurement
FLOOR = 500_000.0


def test_healthy_passes_at_any_drift():
    for d in (0.6, 1.0, 1.7, 1.84, 2.33, 4.0):
        passed, eff = decide(HEALTHY_CLEAN / max(d, 1.0), FLOOR, d)
        assert passed, f"healthy tree failed at drift {d} (eff floor {eff})"


def test_regressed_fails_at_any_drift():
    for d in (0.6, 1.0, 1.7, 1.84, 2.33, 4.0):
        passed, eff = decide(REGRESSED_CLEAN / max(d, 1.0), FLOOR, d)
        assert not passed, f"regressed tree passed at drift {d} (eff floor {eff})"


def test_fast_host_still_owes_full_floor():
    # drift < 1 must not RAISE the bar above the calibrated floor, and
    # must not lower it either
    passed, eff = decide(499_000.0, FLOOR, 0.5)
    assert not passed and eff == FLOOR
    passed, eff = decide(501_000.0, FLOOR, 0.5)
    assert passed


def test_effective_floor_scales_inverse_with_drift():
    _, eff = decide(0.0, FLOOR, 2.0)
    assert eff == FLOOR / 2.0
