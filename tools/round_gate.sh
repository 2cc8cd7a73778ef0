#!/bin/bash
# Round gate: every check the driver (and the judge) will run, in one
# command. Order: cheapest-fail-first. Usage: bash tools/round_gate.sh
set -e
cd "$(dirname "$0")/.."
echo "== 1/5 unit tests" && python -m pytest tests/ -x -q
echo "== 2/5 oracle @ sf0.01 (driver gate scale)" && python tools/check_oracle.py /root/testdata/sf0.01
echo "== 3/5 oracle under a VANILLA session (driver session shape)" && SPARK_GRAFT_VANILLA=1 python tools/check_oracle.py /root/testdata/sf0.001
echo "== 4/5 determinism (double-run, value-identical)" && python tools/determinism_check.py /root/testdata/sf0.001
echo "== 5/5 bench @ sf0.1" && python bench.py 2>/dev/null | tail -1
echo "ROUND GATE: all green"
