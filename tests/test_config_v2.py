"""v2→v3 pipeline-config conversion + reference plugin aliases.

Mirrors pkg/config/config_v2.go:17-63 (IsV3 / ToV3),
config_v3.go:22-30 (SetDefault), config_v3.go:52-58 (mode validation),
and pkg/config/table.go (TableConfig → filter specs).
"""

import tomllib

import pytest

from gravity_spark.plans.config import (
    DEFAULT_INTERNAL_DB,
    V3_VERSION,
    is_v3,
    normalize_pipeline_config,
    table_config_projection,
    v2_to_v3,
)
from gravity_spark.plans.pipeline import build_pipeline

V2_TOML = """
name = "mysql2mysqlDemo"

[input.mysql]
mode = "replication"
host = "source-db"

[[filters]]
type = "reject"
"match-schema" = "test"
"match-table" = "test_table_*"

[[filters]]
type = "delete-dml-column"
"match-schema" = "test"
"match-table" = "test_table"
columns = ["e", "f"]

[output.mysql]
host = "target-db"

[scheduler.batch-table-scheduler]
nr-worker = 10
"""


def test_is_v3_detection():
    v2 = tomllib.loads(V2_TOML)
    assert not is_v3(v2)
    assert is_v3({"input": {"type": "mysql", "mode": "batch"}})


def test_v2_to_v3_exact_shape():
    v3 = v2_to_v3(tomllib.loads(V2_TOML))
    assert v3["name"] == "mysql2mysqlDemo"
    assert v3["input"]["type"] == "mysql"
    assert v3["input"]["mode"] == "replication"  # read from mysql body
    assert v3["input"]["config"]["host"] == "source-db"
    # filters: "type" popped out of the body (config_v2.go:41-49)
    assert [f["type"] for f in v3["filters"]] == ["reject", "delete-dml-column"]
    assert v3["filters"][0]["config"]["match-table"] == "test_table_*"
    assert "type" not in v3["filters"][0]["config"]
    assert v3["output"]["type"] == "mysql"
    assert v3["scheduler"]["type"] == "batch-table-scheduler"
    assert v3["scheduler"]["config"]["nr-worker"] == 10


def test_normalize_defaults_and_aliases():
    cfg = normalize_pipeline_config(tomllib.loads(V2_TOML))
    assert cfg["version"] == V3_VERSION
    assert cfg["internal-db-name"] == DEFAULT_INTERNAL_DB
    # mysql stream/replication input rides the Kafka-CDC Debezium path
    assert cfg["input"]["type"] == "kafka-cdc"
    assert cfg["input"]["config"]["decoder"] == "debezium"
    assert cfg["input"]["config"]["source-type"] == "mysql"
    # mysql output resolves to the SQL-generating JDBC sink
    assert cfg["output"]["type"] == "jdbc-sql"


def test_non_mysql_input_mode_defaults_to_stream():
    v3 = v2_to_v3({"name": "m", "input": {"mongo": {"host": "h"}},
                   "output": {"stdout": {}}})
    assert v3["input"]["mode"] == "stream"
    cfg = normalize_pipeline_config(v3)
    assert cfg["input"]["config"]["decoder"] == "debezium-mongo"
    assert cfg["output"]["type"] == "console"


def test_invalid_mode_rejected():
    with pytest.raises(ValueError, match="invalid mode"):
        normalize_pipeline_config(
            {"input": {"type": "file-cdc", "mode": "sideways"}}
        )


def test_table_config_projection_filters(spark):
    from gravity_spark.core.envelope import memory_changes
    from gravity_spark.operators.filters import apply_filter_chain

    specs = table_config_projection(
        {
            "schema": "app",
            "table": "users",
            "rename-columns": {"v": "val"},
            "ignore-columns": ["secret"],
        }
    )
    rows = [
        {"database": "app", "table": "users", "op": "insert",
         "data": {"id": 1, "v": "x", "secret": "s"}, "pks": {"id": 1}, "seq": 1},
        {"database": "other", "table": "t", "op": "insert",
         "data": {"id": 2, "v": "y", "secret": "s"}, "pks": {"id": 2}, "seq": 2},
    ]
    out = {
        (r["database"], r["table"]): r["data"]
        for r in apply_filter_chain(memory_changes(spark, rows), specs).collect()
    }
    assert out[("app", "users")] == {"id": "1", "val": "x"}
    # out-of-scope table untouched
    assert out[("other", "t")] == {"id": "2", "v": "y", "secret": "s"}


def test_v2_config_builds_and_runs_batch(spark, tmp_path):
    """A v2-layout config (plugins keyed by name) runs end-to-end."""
    cfg = {
        "name": "v2demo",
        "input": {
            "memory-batch": {
                "rows": [
                    {"database": "app", "table": "users", "op": "insert",
                     "data": {"id": 1, "v": "x"}, "pks": {"id": 1}, "seq": 1},
                ]
            }
        },
        "filters": [{"type": "accept", "match-table": "users"}],
        "output": {
            "parquet-merge": {
                "path": str(tmp_path / "tgt_v2"),
                "pk": ["id"],
                "schema": "id long, v string",
            }
        },
    }
    p = build_pipeline(spark, cfg)
    assert not p.is_streaming
    p.run_batch()
    assert [(r["id"], r["v"]) for r in p.target.read().collect()] == [(1, "x")]
