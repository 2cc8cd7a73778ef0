#!/bin/bash
# Round gate: every check the driver (and the judge) will run, in one
# command. Order: cheapest-fail-first. Usage: bash tools/round_gate.sh
#
# The transcript MUST name the tree it graded: the gate stamps HEAD at
# start and end, and refuses to run over uncommitted product code —
# round 7's last two product commits landed after the final gate
# append, leaving the committed transcript covering a stale tree.
# Workflow rule: if product code lands after a gate run, RE-APPEND a
# fresh gate run so ROUND_GATE_r{N}.log's last append names the round's
# final product SHA.
set -e
cd "$(dirname "$0")/.."
HEAD_SHA=$(git rev-parse --short HEAD)
echo "== gate HEAD ${HEAD_SHA} — $(date -u +%Y-%m-%dT%H:%MZ)"
if ! git diff --quiet HEAD -- gravity_spark tools tests bench.py __spark_entry__.py; then
  echo "GATE FAIL: uncommitted product/test changes — commit first so the transcript names the graded tree"
  git status --short -- gravity_spark tools tests bench.py __spark_entry__.py
  exit 1
fi
echo "== 1/7 unit tests" && python -m pytest tests/ -x -q
echo "== 2/7 oracle @ sf0.01 (driver gate scale)" && python tools/check_oracle.py /root/testdata/sf0.01
echo "== 3/7 oracle under a VANILLA session (driver session shape)" && SPARK_GRAFT_VANILLA=1 python tools/check_oracle.py /root/testdata/sf0.001
echo "== 4/7 determinism (double-run, value-identical)" && python tools/determinism_check.py /root/testdata/sf0.001
echo "== 5/7 plan hygiene (pushdown, no cartesian, no partition-less windows)" && python tools/explain_audit.py /root/testdata/sf0.001 > /dev/null
# stderr stays in the transcript (advisor: 2>/dev/null + set -e meant a
# crashed gate step aborted with no diagnostic); Spark's log4j chatter
# goes to a sidecar so the transcript stays readable.
echo "== 6/7 CDC apply-path throughput floor (20M rows; the r7 regression class)" && { python tools/throughput_gate.py 2>/tmp/gate_tp_stderr.log || { echo "throughput gate failed/crashed; last stderr:"; tail -40 /tmp/gate_tp_stderr.log; exit 1; }; }
echo "== 7/7 bench @ sf0.1 (stall-sentinel-stamped)" && { python bench.py 2>/tmp/gate_bench_stderr.log | tail -1; test "${PIPESTATUS[0]}" = 0 || { echo "bench step failed; last stderr:"; tail -40 /tmp/gate_bench_stderr.log; exit 1; }; }
echo "ROUND GATE: all green on HEAD ${HEAD_SHA}"
