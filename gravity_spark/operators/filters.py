"""The filter chain: gravity's emitter filters as DataFrame transforms.

Reference parity:
  - pkg/core/filter.go:3-7 — Filter(msg) -> (continueNext, err)
  - pkg/emitter/emitter.go:39-86 — filters run in order per msg
  - pkg/filters/reject_filter.go:25-31, accept_filter.go:73-78
  - pkg/filters/delete_dml_column_filter.go:148-171
  - pkg/filters/rename_dml_column_filter.go:266-299
  - pkg/filters/base_filter.go:53-73 — every filter is scoped by a
    matcher group; non-matching msgs pass through UNTOUCHED.

Design: each filter is ``DataFrame -> DataFrame`` over the envelope.
The matcher-scoping rule means column mutations must be conditional
(F.when(matched, mutated).otherwise(original)) rather than global —
that keeps one uniform plan with no per-message branching, which is
what survives at 100 TB: a single codegen'd projection instead of a
row-at-a-time plugin chain.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gravity_spark.core.matchers import compile_matchers


def reject_filter(df: DataFrame, matchers: Mapping[str, Any]) -> DataFrame:
    """Drop rows that match (pkg/filters/reject_filter.go:25-31)."""
    return df.filter(~compile_matchers(matchers))


def accept_filter(df: DataFrame, matchers: Mapping[str, Any]) -> DataFrame:
    """Keep only rows that match (pkg/filters/accept_filter.go:73-78)."""
    return df.filter(compile_matchers(matchers))


def _map_without_keys(col: Column, keys: Sequence[str]) -> Column:
    return F.map_filter(col, lambda k, _: ~k.isin(*keys))


def delete_dml_columns(
    df: DataFrame, columns: Sequence[str], matchers: Mapping[str, Any] | None = None
) -> DataFrame:
    """Remove named payload columns from data/old/pks
    (pkg/filters/delete_dml_column_filter.go:148-171)."""
    cond = compile_matchers(matchers or {})
    out = df
    for field in ("data", "old", "pks"):
        mutated = F.when(F.col(field).isNull(), F.col(field)).otherwise(
            _map_without_keys(F.col(field), columns)
        )
        out = out.withColumn(field, F.when(cond, mutated).otherwise(F.col(field)))
    return out


def rename_dml_columns(
    df: DataFrame,
    mapping: Mapping[str, str],
    matchers: Mapping[str, Any] | None = None,
) -> DataFrame:
    """Rename payload columns from->to in data/old/pks
    (pkg/filters/rename_dml_column_filter.go:266-299)."""
    cond = compile_matchers(matchers or {})

    def rename_key(k: Column) -> Column:
        expr = k
        for src, dst in mapping.items():
            expr = F.when(k == src, F.lit(dst)).otherwise(expr)
        return expr

    out = df
    for field in ("data", "old", "pks"):
        entries = F.map_entries(F.col(field))
        mutated = F.map_from_entries(
            F.transform(entries, lambda e: F.struct(rename_key(e["key"]).alias("key"), e["value"].alias("value")))
        )
        mutated = F.when(F.col(field).isNull(), F.col(field)).otherwise(mutated)
        out = out.withColumn(field, F.when(cond, mutated).otherwise(F.col(field)))
    return out


def subprocess_filter(
    df: DataFrame,
    command: Sequence[str],
    matchers: Mapping[str, Any] | None = None,
) -> DataFrame:
    """External-process transform — the reference's grpc-sidecar slot
    (pkg/filters/grpc_sidecar_filter.go:43-120) as "run a foreign
    executable per Arrow batch": matcher-scoped rows are piped through
    a user-supplied command as an Arrow IPC stream on stdin, and the
    mutated rows are read back as an Arrow IPC stream from stdout
    (same schema — the contract is value mutation of Data/Old/Pks,
    exactly the sidecar's msgpb.Msg in/out shape). Non-matching rows
    pass through UNTOUCHED, like every matcher-scoped filter.

    Uses mapInArrow, so rows never round-trip through pandas: what the
    child sees is the batch's own Arrow representation. One process
    invocation per Arrow batch (~10k rows) — per-process cost amortized
    over the batch, the same economics as the sidecar's per-batch gRPC
    call; the child can be ANY language with an Arrow library.

    Scale shape: embarrassingly parallel map over partitions; no
    shuffle; executor-local pipes only."""
    cond = compile_matchers(matchers or {})
    cmd = [str(c) for c in command]

    def run(batches):
        import io
        import subprocess

        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                yield batch
                continue
            sink = io.BytesIO()
            with pa.ipc.new_stream(sink, batch.schema) as w:
                w.write_batch(batch)
            proc = subprocess.run(
                cmd, input=sink.getvalue(), stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"subprocess filter {cmd!r} failed "
                    f"(rc={proc.returncode}): {proc.stderr.decode()[:500]}"
                )
            with pa.ipc.open_stream(proc.stdout) as reader:
                for out in reader:
                    yield out

    if matchers:
        # NULL-predicate rows (e.g. DDL messages with op=NULL under a
        # match-dml-op matcher) must pass through UNTOUCHED — filter()
        # excludes NULL on both branches, so coalesce the match side to
        # False and route NULLs down the pass-through side explicitly.
        matched = df.filter(F.coalesce(cond, F.lit(False))).mapInArrow(run, df.schema)
        return matched.unionByName(df.filter(cond.isNull() | ~cond))
    return df.mapInArrow(run, df.schema)


FilterFn = Callable[[DataFrame], DataFrame]


def split_dead_letter(changes: DataFrame, table_def) -> tuple[DataFrame, DataFrame]:
    """Dead-letter quarantine: split an envelope stream into (clean,
    dead) by validating every payload value against the catalog's type
    matrix — a raw value that is present but fails its column's
    coercion (non-numeric text in a numeric column, garbage in a
    timestamp) marks the ROW dead. Dead rows keep the full envelope so
    the quarantine sink preserves replayability; clean rows proceed to
    the typed projection, which can no longer silently NULL a corrupt
    value (the failure mode this operator exists to remove).

    The zero-date → NULL mapping is the reference's own documented
    coercion (integration_test/mysql_mysql_test.go:770), not
    corruption, and stays clean. Row-local column expressions only —
    no shuffle, safe at any scale; wire it before the sink and point
    the dead side at a second (append-only) target, the standard DLQ
    topology the reference lacks (it errors the whole pipeline).
    """
    from gravity_spark.core.catalog import coerce_from_string

    dead = F.lit(False)
    for c in table_def.columns:
        if c.generated:
            continue
        raw = F.col("data").getItem(c.name)
        bad = (
            raw.isNotNull()
            & coerce_from_string(raw, c.mysql_type, lenient=True).isNull()
        )
        if c.spark_type.simpleString() in ("timestamp", "date"):
            bad = bad & ~raw.startswith("0000-00-00")
        dead = dead | F.coalesce(bad, F.lit(False))
    flagged = changes.withColumn("__dead", dead)
    return (
        flagged.filter(~F.col("__dead")).drop("__dead"),
        flagged.filter(F.col("__dead")).drop("__dead"),
    )


def build_filter(spec: Mapping[str, Any]) -> FilterFn:
    """One config block -> one transform (registry lookup parity,
    pkg/registry/registry.go:12-80 + pkg/filters/filters.go)."""
    kind = spec["type"]
    cfg = spec.get("config", {})
    matchers = {k: v for k, v in cfg.items() if k.startswith("match-")}
    if kind == "reject":
        return lambda df: reject_filter(df, matchers)
    if kind == "accept":
        return lambda df: accept_filter(df, matchers)
    if kind == "delete-dml-column":
        return lambda df: delete_dml_columns(df, cfg["columns"], matchers)
    if kind == "rename-dml-column":
        return lambda df: rename_dml_columns(
            df, dict(zip(cfg["from"], cfg["to"])), matchers
        )
    if kind == "python":
        # arbitrary user code — the Spark-native replacement for the
        # grpc-sidecar filter (pkg/filters/grpc_sidecar_filter.go:43-120)
        fn = cfg["fn"]
        return lambda df: fn(df)
    if kind == "subprocess":
        # foreign-executable transform (grpc-sidecar mechanical parity):
        # Arrow IPC through the command's stdin/stdout, matcher-scoped
        return lambda df: subprocess_filter(df, cfg["command"], matchers)
    raise ValueError(f"unknown filter type {kind!r}")


def apply_filter_chain(df: DataFrame, specs: Sequence[Mapping[str, Any]]) -> DataFrame:
    """Compose the configured filters in order (pkg/emitter/emitter.go:39-86)."""
    for spec in specs:
        df = build_filter(spec)(df)
    return df
