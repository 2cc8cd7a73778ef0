"""Subprocess transform filter: grpc-sidecar mechanical parity
(pkg/filters/grpc_sidecar_filter.go:43-120) — a user-supplied FOREIGN
EXECUTABLE mutates Data/Old/Pks, fed Arrow IPC record batches over
stdin/stdout, matcher-scoped like every filter."""

import sys
import textwrap

from pyspark.sql import functions as F

from gravity_spark.core.envelope import memory_changes
from gravity_spark.operators.filters import apply_filter_chain, subprocess_filter

ROWS = [
    {"database": "test", "table": "users", "op": "insert",
     "data": {"id": 1, "name": "ann"}, "pks": {"id": 1}, "seq": 1},
    {"database": "test", "table": "users", "op": "update",
     "data": {"id": 2, "name": "bob"}, "old": {"id": 2, "name": "b0b"},
     "pks": {"id": 2}, "seq": 2},
    {"database": "test", "table": "orders", "op": "insert",
     "data": {"id": 3, "amt": 5}, "pks": {"id": 3}, "seq": 3},
]

#: toy sidecar: uppercase every data value, tag old values, prefix pks
CHILD = textwrap.dedent(
    """
    import sys
    import pyarrow as pa

    reader = pa.ipc.open_stream(sys.stdin.buffer)
    schema = reader.schema
    rows = []
    for batch in reader:
        for row in batch.to_pylist():
            for field, fn in (
                ("data", lambda v: (v or "").upper()),
                ("old", lambda v: "old:" + (v or "")),
                ("pks", lambda v: "pk-" + (v or "")),
            ):
                if row[field] is not None:
                    row[field] = {k: fn(v) for k, v in dict(row[field]).items()}
            rows.append(row)
    out = pa.RecordBatch.from_pylist(rows, schema=schema)
    with pa.ipc.new_stream(sys.stdout.buffer, schema) as w:
        w.write_batch(out)
    """
)


def _write_child(tmp_path) -> list[str]:
    script = tmp_path / "sidecar.py"
    script.write_text(CHILD)
    return [sys.executable, str(script)]


def test_subprocess_filter_mutates_matched_rows_only(spark, tmp_path):
    df = memory_changes(spark, ROWS)
    out = subprocess_filter(df, _write_child(tmp_path), {"match-table": "users"})
    assert out.schema == df.schema
    rows = {r["seq"]: r for r in out.collect()}
    assert len(rows) == 3
    # matched rows: every envelope payload map mutated by the child
    assert rows[1]["data"] == {"id": "1", "name": "ANN"}
    assert rows[1]["pks"] == {"id": "pk-1"}
    assert rows[2]["data"] == {"id": "2", "name": "BOB"}
    assert rows[2]["old"] == {"id": "old:2", "name": "old:b0b"}
    # non-matching row passes through UNTOUCHED
    assert rows[3]["data"] == {"id": "3", "amt": "5"}
    assert rows[3]["pks"] == {"id": "3"}


def test_subprocess_filter_in_chain_config(spark, tmp_path):
    spec = {
        "type": "subprocess",
        "config": {"command": _write_child(tmp_path), "match-table": "users"},
    }
    out = apply_filter_chain(memory_changes(spark, ROWS), [spec])
    got = {r["seq"]: r["data"] for r in out.collect()}
    assert got[1]["name"] == "ANN" and got[3]["amt"] == "5"


def test_subprocess_filter_null_predicate_rows_pass_through(spark, tmp_path):
    """A match-dml-op matcher evaluates to NULL on DDL rows (op=NULL);
    those rows must pass through UNTOUCHED, not be dropped (the
    base_filter.go pass-through contract)."""
    rows = ROWS + [
        {"database": "test", "table": "users", "op": None, "type": "ddl",
         "ddl_statement": "ALTER TABLE users ADD COLUMN x int", "seq": 4},
    ]
    df = memory_changes(spark, rows)
    out = subprocess_filter(df, _write_child(tmp_path), {"match-dml-op": "insert"})
    got = {r["seq"]: r for r in out.collect()}
    assert len(got) == 4
    # DDL row (op NULL → predicate NULL) survives, untouched
    assert got[4]["ddl_statement"] == "ALTER TABLE users ADD COLUMN x int"
    # matched insert rows mutated; non-matching update row untouched
    assert got[1]["data"]["name"] == "ANN"
    assert got[3]["data"]["amt"] == "5"
    assert got[2]["data"]["name"] == "bob"


def test_subprocess_filter_failure_is_loud(spark, tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(3)")
    import pytest

    df = memory_changes(spark, ROWS)
    with pytest.raises(Exception, match="subprocess filter|rc=3|Py4J"):
        subprocess_filter(df, [sys.executable, str(bad)]).collect()
