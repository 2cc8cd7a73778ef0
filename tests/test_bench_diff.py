"""Unit tests for tools/bench_diff.py's pure adjudication logic (the
live --retime path is exercised manually; these pin the table rules)."""

from tools.bench_diff import disagreements


def test_disagreements_ratio_gate_and_impact_order():
    a = {"q1": 1.0, "q2": 2.0, "q3": 0.2, "q4": 1.0, "only_a": 5.0}
    b = {"q1": 1.4, "q2": 4.2, "q3": 0.9, "q4": -1.0, "only_b": 5.0}
    rows = disagreements(a, b, ratio=1.5)
    names = [r[0] for r in rows]
    assert "q1" not in names  # 1.4x is under the gate
    assert "q4" not in names  # failed run (-1) excluded
    assert "only_a" not in names and "only_b" not in names  # not common
    assert set(names) == {"q2", "q3"}
    # impact order: ratio x magnitude — q2 (2.1x of 4.2s) outranks
    # q3 (4.5x of 0.9s)? impact = ratio * max_sec: q2=2.1*4.2=8.8,
    # q3=4.5*0.9=4.05
    assert names[0] == "q2"


def test_disagreements_symmetric_in_direction():
    # a slower than b and b slower than a both surface
    a = {"x": 3.0, "y": 1.0}
    b = {"x": 1.0, "y": 3.0}
    rows = disagreements(a, b, ratio=1.5)
    assert {r[0] for r in rows} == {"x", "y"}
    for _, xa, xb, r in rows:
        assert r == 3.0
