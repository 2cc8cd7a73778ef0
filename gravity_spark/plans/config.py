"""Pipeline-config compatibility layer: v2 → v3 + reference plugin aliases.

Reference parity:
  - pkg/config/config_v2.go:9-23 — PipelineConfigV2 (plugins keyed by
    type name) + IsV3 detection (input has an explicit "type" key)
  - pkg/config/config_v2.go:25-63 — ToV3 conversion: input key → type
    (mode read from the mysql plugin's config, "stream" otherwise),
    filters get their "type" popped out of the body, output/scheduler
    key → type
  - pkg/config/config_v3.go:9-30 — SetDefault: version "1.0",
    internal-db-name "_gravity"; InputMode batch|stream|replication
  - pkg/config/table.go — TableConfig: rename-columns, ignore-columns,
    pk-override, scan-column/scan-type

A user of the reference can hand `load_pipeline` their existing gravity
TOML: v2 layouts are converted exactly as ToV3 does, and reference
plugin type names resolve through ALIASES to the Spark-first builders
(mysql stream rides the Kafka-CDC Debezium topic per SURVEY §2's
mapping; mysql batch is a partitioned JDBC read; tidb_kafka is the
binlog-slave decoder over the same transport).
"""

from __future__ import annotations

from typing import Any, Mapping

V3_VERSION = "1.0"
DEFAULT_INTERNAL_DB = "_gravity"
VALID_MODES = {"batch", "stream", "replication"}

# reference plugin type → (repo source/sink type, extra config defaults).
# Inputs whose live transport is environment-gated still resolve — the
# builder raises at construction time with the missing dependency, not
# at config-parse time (matching the reference's registry lookup order,
# pkg/app/server.go:38-105: config errors first, connection errors later).
INPUT_ALIASES: dict[str, tuple[str, dict[str, Any]]] = {
    "mysql": ("kafka-cdc", {"decoder": "debezium"}),
    "mysqlbatch": ("jdbc-batch", {}),
    "mongo": ("kafka-cdc", {"decoder": "debezium-mongo"}),
    "mongobatch": ("jdbc-batch", {}),
    "tidb_kafka": ("kafka-cdc", {"decoder": "tidb"}),
}
OUTPUT_ALIASES: dict[str, tuple[str, dict[str, Any]]] = {
    "mysql": ("jdbc-sql", {}),
    "elasticsearch": ("esmodel", {}),
    "async-kafka": ("kafka-wire", {}),
    "stdout": ("console", {}),
}


def is_v3(config: Mapping[str, Any]) -> bool:
    """config_v2.go:17-23 — a config is v3 iff [input] carries an
    explicit "type" key (v2 keys the input table BY plugin name)."""
    inp = config.get("input", {})
    return isinstance(inp, Mapping) and "type" in inp


def v2_to_v3(config: Mapping[str, Any]) -> dict[str, Any]:
    """Exact ToV3 semantics (config_v2.go:25-63)."""
    out: dict[str, Any] = {"name": config.get("name")}

    inp = config.get("input", {})
    for plugin, body in inp.items():
        body = dict(body or {})
        mode = body.get("mode", "stream") if plugin == "mysql" else "stream"
        out["input"] = {"type": plugin, "mode": mode, "config": body}

    filters = []
    for f in config.get("filters", ()):
        f = dict(f)
        ftype = f.pop("type")
        filters.append({"type": ftype, "config": f})
    if filters:
        out["filters"] = filters

    for plugin, body in config.get("output", {}).items():
        out["output"] = {"type": plugin, "config": dict(body or {})}

    for plugin, body in config.get("scheduler", {}).items():
        out["scheduler"] = {"type": plugin, "config": dict(body or {})}

    return out


def _apply_aliases(cfg: dict[str, Any]) -> dict[str, Any]:
    inp = cfg.get("input")
    if inp and inp.get("type") in INPUT_ALIASES:
        repo_type, defaults = INPUT_ALIASES[inp["type"]]
        body = {**defaults, **inp.get("config", {})}
        body.setdefault("source-type", inp["type"])  # provenance
        cfg["input"] = {**inp, "type": repo_type, "config": body}
    out = cfg.get("output")
    if out and out.get("type") in OUTPUT_ALIASES:
        repo_type, defaults = OUTPUT_ALIASES[out["type"]]
        cfg["output"] = {
            **out,
            "type": repo_type,
            "config": {**defaults, **out.get("config", {})},
        }
    return cfg


def normalize_pipeline_config(config: Mapping[str, Any]) -> dict[str, Any]:
    """v2→v3 if needed, apply SetDefault, validate mode, resolve
    reference plugin aliases. Returns a plain dict build_pipeline
    understands; raises ValueError on an invalid mode
    (config_v3.go:52-58)."""
    cfg = dict(config) if is_v3(config) else v2_to_v3(config)
    cfg.setdefault("version", V3_VERSION)
    cfg.setdefault("internal-db-name", DEFAULT_INTERNAL_DB)
    inp = cfg.get("input")
    if inp:
        mode = inp.get("mode", "stream")
        if mode not in VALID_MODES:
            raise ValueError(f"invalid mode: {mode}")
    return _apply_aliases(cfg)


def table_config_projection(table_cfg: Mapping[str, Any]) -> list[dict[str, Any]]:
    """TableConfig (pkg/config/table.go) → the repo's filter specs:
    rename-columns → rename-dml-column, ignore-columns →
    delete-dml-column, scoped to the table's matcher. pk-override and
    scan-column are consumed by the batch scanner / merge target, not
    the filter chain."""
    scope = {
        "match-schema": table_cfg.get("schema", "*"),
        "match-table": table_cfg.get("table", "*"),
    }
    specs: list[dict[str, Any]] = []
    renames = table_cfg.get("rename-columns")
    if renames:
        specs.append(
            {
                "type": "rename-dml-column",
                "config": {
                    **scope,
                    "from": list(renames.keys()),
                    "to": list(renames.values()),
                },
            }
        )
    ignores = table_cfg.get("ignore-columns")
    if ignores:
        specs.append(
            {"type": "delete-dml-column", "config": {**scope, "columns": list(ignores)}}
        )
    return specs
