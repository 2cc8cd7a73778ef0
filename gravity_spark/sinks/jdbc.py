"""Relational-database sink: the mysql output's SQL engines over DB-API.

Reference parity (pkg/sql_execution_engine/):
  - utils.go:19-107 — multi-row ``REPLACE INTO t (..) VALUES (..),(..)``
    + single-row ``DELETE FROM t WHERE pk = ?``
  - utils.go:109-127 — ``INSERT IGNORE``
  - utils.go:129-185 — ``INSERT .. ON DUPLICATE KEY UPDATE``
  - mysql.go:452-482 — batches split at DELETE boundaries so mixed
    batches apply in order

Design: SQL strings are generated driver-side (pure functions, unit-
testable); row delivery happens in ``foreachPartition`` with a caller-
supplied DB-API connection factory — each Spark partition holds one
connection and writes its slice in order. Combined with the per-key
hash partitioning upstream (dep_hash), this preserves the reference's
per-key ordering guarantee across a parallel write fleet.

Spark's built-in ``df.write.jdbc`` only appends/overwrites; upsert
semantics need these explicit statements.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

ENGINE_SQL_REPLACE = "replace"
ENGINE_SQL_INSERT_IGNORE = "insert-ignore"
ENGINE_SQL_ON_DUP = "on-duplicate-key-update"


def build_replace_sql(table: str, cols: Sequence[str], n_rows: int) -> str:
    """Multi-row REPLACE INTO (utils.go:42-75)."""
    row = "(" + ", ".join("?" for _ in cols) + ")"
    return (
        f"REPLACE INTO {table} ({', '.join(cols)}) VALUES "
        + ", ".join(row for _ in range(n_rows))
    )


def build_insert_ignore_sql(table: str, cols: Sequence[str], n_rows: int) -> str:
    """Multi-row INSERT IGNORE (utils.go:109-127)."""
    row = "(" + ", ".join("?" for _ in cols) + ")"
    return (
        f"INSERT IGNORE INTO {table} ({', '.join(cols)}) VALUES "
        + ", ".join(row for _ in range(n_rows))
    )


def build_on_dup_sql(table: str, cols: Sequence[str], pk_cols: Sequence[str]) -> str:
    """Single-row upsert via ON DUPLICATE KEY UPDATE (utils.go:129-185);
    non-PK columns update on conflict."""
    row = "(" + ", ".join("?" for _ in cols) + ")"
    updates = ", ".join(f"{c} = VALUES({c})" for c in cols if c not in set(pk_cols))
    return (
        f"INSERT INTO {table} ({', '.join(cols)}) VALUES {row} "
        f"ON DUPLICATE KEY UPDATE {updates}"
    )


def build_delete_sql(table: str, pk_cols: Sequence[str]) -> str:
    """Single-row delete keyed on the PK (utils.go:77-107)."""
    cond = " AND ".join(f"{c} = ?" for c in pk_cols)
    return f"DELETE FROM {table} WHERE {cond}"


def split_at_deletes(rows: list[tuple], op_index: int) -> list[list[tuple]]:
    """Split an ordered row list into runs at DELETE boundaries
    (mysql.go:452-482): each run is either all-deletes or all-upserts,
    applied in order."""
    runs: list[list[tuple]] = []
    current: list[tuple] = []
    current_is_delete: bool | None = None
    for row in rows:
        is_delete = row[op_index] == "delete"
        if current_is_delete is None or is_delete == current_is_delete:
            current.append(row)
        else:
            runs.append(current)
            current = [row]
        current_is_delete = is_delete
    if current:
        runs.append(current)
    return runs


def write_batch_dbapi(
    changes: DataFrame,
    connection_factory: Callable[[], "object"],
    table: str,
    pk_cols: Sequence[str],
    engine: str = ENGINE_SQL_REPLACE,
    op_col: str = "op",
    order_col: str = "seq",
    rows_per_statement: int = 100,
    paramstyle: str = "qmark",
) -> None:
    """Apply a typed change batch to a DB-API target, partition-parallel.

    Each partition: one connection, ordered runs split at DELETE
    boundaries, multi-row statements batched ``rows_per_statement`` at a
    time, one commit per partition (txn per partition ≈ the reference's
    per-batch txn). ``paramstyle='format'`` rewrites ? → %s for MySQL
    drivers.
    """
    value_cols = [c for c in changes.columns if c not in (op_col, order_col)]
    pk_idx = [value_cols.index(c) for c in pk_cols]
    op_index = len(value_cols)  # op appended after values in the row tuple
    engine_name = engine

    def fix(sql: str) -> str:
        return sql.replace("?", "%s") if paramstyle == "format" else sql

    def write_partition(rows_iter) -> None:
        rows = [
            tuple(r[c] for c in value_cols) + (r[op_col],)
            for r in sorted(rows_iter, key=lambda r: r[order_col])
        ]
        if not rows:
            return
        conn = connection_factory()
        try:
            cur = conn.cursor()
            for run in split_at_deletes(rows, op_index):
                if run[0][op_index] == "delete":
                    sql = fix(build_delete_sql(table, pk_cols))
                    cur.executemany(sql, [tuple(r[i] for i in pk_idx) for r in run])
                    continue
                for i in range(0, len(run), rows_per_statement):
                    chunk = run[i : i + rows_per_statement]
                    if engine_name == ENGINE_SQL_REPLACE:
                        sql = fix(build_replace_sql(table, value_cols, len(chunk)))
                        params = [v for r in chunk for v in r[:op_index]]
                        cur.execute(sql, params)
                    elif engine_name == ENGINE_SQL_INSERT_IGNORE:
                        sql = fix(build_insert_ignore_sql(table, value_cols, len(chunk)))
                        params = [v for r in chunk for v in r[:op_index]]
                        cur.execute(sql, params)
                    elif engine_name == ENGINE_SQL_ON_DUP:
                        sql = fix(build_on_dup_sql(table, value_cols, pk_cols))
                        cur.executemany(sql, [r[:op_index] for r in chunk])
                    else:
                        raise ValueError(f"unknown engine {engine_name!r}")
            conn.commit()
        finally:
            conn.close()

    changes.foreachPartition(write_partition)
