#!/bin/bash
# Round gate: every check the driver (and the judge) will run, in one
# command. Order: cheapest-fail-first. Usage: bash tools/round_gate.sh
set -e
cd "$(dirname "$0")/.."
echo "== 1/6 unit tests" && python -m pytest tests/ -x -q
echo "== 2/6 oracle @ sf0.01 (driver gate scale)" && python tools/check_oracle.py /root/testdata/sf0.01
echo "== 3/6 oracle under a VANILLA session (driver session shape)" && SPARK_GRAFT_VANILLA=1 python tools/check_oracle.py /root/testdata/sf0.001
echo "== 4/6 determinism (double-run, value-identical)" && python tools/determinism_check.py /root/testdata/sf0.001
echo "== 5/6 plan hygiene (pushdown, no cartesian, no partition-less windows)" && python tools/explain_audit.py /root/testdata/sf0.001 > /dev/null
echo "== 6/6 bench @ sf0.1 (stall-sentinel-stamped)" && python bench.py 2>/dev/null | tail -1
echo "ROUND GATE: all green"
