"""Batch snapshot source: gravity's mysql-batch/mongo-batch rebuilt on
Spark's partitioned readers.

Reference parity:
  - pkg/inputs/mysqlbatch/input.go:457-493 — DetectScanColumns: PK →
    single-col UK → full dump when small
  - pkg/inputs/mysqlbatch/mysql_table_scanner.go:115-164 — min/max bounds
  - mysql_table_scanner.go:166-331 — keyset pagination; Spark's JDBC
    partitionColumn/lowerBound/upperBound/numPartitions does the same
    chunked parallel scan natively
  - pkg/inputs/mysqlbatch/position_value.go:27-108 — per-chunk scan
    position (min/max/current/done)

For the local harness the "database" is parquet; ``chunked_scan`` tags
rows with the chunk they'd belong to so scan-position tracking and
per-chunk stats behave identically. At cluster scale the same column
drives ``repartitionByRange`` for co-located downstream work.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def detect_scan_column(
    pk_cols: Sequence[str],
    unique_cols: Sequence[Sequence[str]],
    row_count: int,
    max_full_dump_count: int = 10_000,
) -> str | None:
    """Pick the pagination column: single PK → first single-column UK →
    None (full dump) when the table is small enough. Raises when the
    table is large and keyless (same failure mode as the reference)."""
    if len(pk_cols) == 1:
        return pk_cols[0]
    for uk in unique_cols:
        if len(uk) == 1:
            return uk[0]
    if row_count <= max_full_dump_count:
        return None
    raise ValueError(
        "no single-column scan key and table exceeds max-full-dump-count"
    )


def scan_bounds(df: DataFrame, column: str) -> tuple:
    """min/max bounds for the scan column (one cheap agg — parquet
    answers from footer stats; JDBC pushes SELECT min,max)."""
    row = df.agg(F.min(column).alias("lo"), F.max(column).alias("hi")).collect()[0]
    return row["lo"], row["hi"]


def chunked_scan(df: DataFrame, column: str, chunk_size: int = 10_000) -> DataFrame:
    """Tag each row with its scan chunk (keyset-pagination equivalent).

    chunk_id = floor(key / chunk_size): deterministic, ordered, and
    usable both for scan-position bookkeeping and range repartitioning.
    """
    return df.withColumn(
        "chunk_id", F.floor(F.col(column) / F.lit(chunk_size)).cast("long")
    )


def jdbc_scan_options(
    url: str,
    table: str,
    scan_column: str | None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 10,
    condition: str | None = None,
    properties: dict | None = None,
) -> dict[str, str]:
    """Pure option assembly for the JDBC partitioned read — the chunked
    keyset scan expressed as Spark's native partitioned JDBC options.
    Condition pushdown mirrors TableConfig.Condition
    (pkg/inputs/mysqlbatch/input.go:25-35) via a filtered dbtable
    subquery."""
    src = f"(SELECT * FROM {table} WHERE {condition}) AS t" if condition else table
    opts: dict[str, str] = {
        "url": url,
        "dbtable": src,
        "fetchsize": "10000",
        **{k: str(v) for k, v in (properties or {}).items()},
    }
    if scan_column is not None and lower is not None and upper is not None:
        opts.update(
            partitionColumn=scan_column,
            lowerBound=str(lower),
            upperBound=str(upper),
            numPartitions=str(num_partitions),
        )
    return opts


def jdbc_partitioned_reader(spark: SparkSession, **kwargs):
    """Configured (unloaded) DataFrameReader from jdbc_scan_options."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_scan_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader


def dbapi_keyset_scan(
    conn_factory,
    table: str,
    columns: Sequence[str],
    scan_column: str,
    batch_size: int = 1000,
    position_store=None,
    pipeline_name: str = "batch_scan",
    max_batches: int | None = None,
):
    """Keyset-paginated scan over a LIVE DB-API connection — the
    reference's per-table scanner loop
    (pkg/inputs/mysqlbatch/mysql_table_scanner.go:166-331):

        SELECT <cols> FROM t WHERE <col> > ? ORDER BY <col> LIMIT n

    yielding one row-tuple batch at a time, with the scan position
    ledger (position_value.go:27-108) flushed AFTER each batch is
    consumed — kill the consumer mid-scan and a new scan resumes
    strictly after the last batch whose consumption completed, so the
    killed batch is REDELIVERED (at-least-once, the reference's
    replay-from-position contract; the downstream merge's LWW
    idempotency absorbs the duplicate).

    ``max_batches`` bounds one invocation (tests use it to simulate a
    kill; production leaves it None). Scale note: this is the
    single-connection per-table scanner; at cluster scale the same
    ledger bounds feed ``jdbc_partitioned_reader`` range splits
    instead."""
    state = position_store.get(pipeline_name) if position_store else None
    if state and state.get("done"):
        return
    current = state.get("current_key") if state else None
    col_sql = ", ".join(columns)
    idx = list(columns).index(scan_column)
    conn = conn_factory()
    try:
        n = 0
        exhausted = False
        while max_batches is None or n < max_batches:
            if current is None:
                cur = conn.execute(
                    f"SELECT {col_sql} FROM {table} "
                    f"ORDER BY {scan_column} LIMIT ?",
                    (batch_size,),
                )
            else:
                cur = conn.execute(
                    f"SELECT {col_sql} FROM {table} WHERE {scan_column} > ? "
                    f"ORDER BY {scan_column} LIMIT ?",
                    (current, batch_size),
                )
            rows = cur.fetchall()
            if not rows:
                exhausted = True
                break
            current = rows[-1][idx]
            n += 1
            yield rows
            # position flushed only after the consumer finished the
            # batch (generator resumed) — crash between yield and here
            # replays the batch, never skips it
            if position_store is not None:
                position_store.put(
                    pipeline_name,
                    {
                        "stage": "batch",
                        "table": table,
                        "scan_column": scan_column,
                        "current_key": current,
                        "done": False,
                    },
                    flush=True,
                )
            if len(rows) < batch_size:
                exhausted = True
                break
        if exhausted and position_store is not None:
            position_store.put(
                pipeline_name,
                {
                    "stage": "batch",
                    "table": table,
                    "scan_column": scan_column,
                    "current_key": current,
                    "done": True,
                },
                flush=True,
            )
    finally:
        conn.close()


def snapshot_table(
    df: DataFrame,
    scan_column: str | None,
    chunk_size: int = 10_000,
) -> tuple[DataFrame, DataFrame]:
    """Run a snapshot scan over an already-loadable relation and produce
    (rows, scan_positions) — the per-chunk position ledger the reference
    persists (position_value.go:27-108)."""
    if scan_column is None:
        rows = df.withColumn("chunk_id", F.lit(0).cast("long"))
    else:
        rows = chunked_scan(df, scan_column, chunk_size)
    positions = rows.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        *( [F.min(scan_column).alias("min_key"), F.max(scan_column).alias("max_key")]
           if scan_column else [] ),
        F.lit(True).alias("done"),
    )
    return rows, positions
