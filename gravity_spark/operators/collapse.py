"""Per-key ordered collapse — the batch/micro-batch replacement for
gravity's batch-table-scheduler.

Reference parity:
  - pkg/schedulers/batch_table_scheduler/batch_table_scheduler.go:61-71 —
    guarantee: same-row changes apply in source order; different rows/
    tables go concurrent.
  - batch_table_scheduler.go:434-535 — the latch algorithm holds back a
    change whose dep-hash collides with an in-flight batch.
  - pkg/sliding_window/static_sliding_window.go:17-120 — in-order ack.

Spark design: within one (micro-)batch, per-key ordering + conflict
latching collapse to a single idea — keep only the LAST change per key
(last-write-wins) and apply the batch idempotently. The scheduler's
concurrency shape (table dispatcher → worker queues) is replaced by
hash partitioning on the dep-hash: same key → same partition, no
cross-partition coordination. This scales linearly: no sliding window,
no latches, just a window function inside each shuffle partition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pk_canonical(pks_col: Column) -> Column:
    """Canonical sortable string for a PK map (maps are not orderable/
    partitionable in Spark): entries sorted by key, joined with unit
    separators."""
    kv = F.array_sort(F.map_entries(pks_col))
    return F.array_join(
        F.transform(kv, lambda e: F.concat_ws("\x1f", e["key"], e["value"])), "\x1e"
    )


def collapse_last_write_wins(
    changes: DataFrame,
    key_cols: Sequence[str] | None = None,
    order_col: str = "seq",
) -> DataFrame:
    """Collapse a change batch to the newest change per key.

    ``key_cols`` defaults to the envelope addressing (database, table,
    pks map). The winner per key is the row with the highest
    ``order_col`` (InputSequence — per-stream monotonic,
    pkg/core/msg.go:70-76).

    Note PK-updates arrive as delete(old)+insert(new) pairs with
    *different* pks (pkg/inputs/mysqlstream/msg.go:170-225), so they
    collapse independently per key — exactly the semantics the
    reference's latch preserves.
    """
    if key_cols:
        keys: list = list(key_cols)
        df = changes
    else:
        # envelope default: address by (db, table, canonical pk string)
        df = changes.withColumn("__pk", pk_canonical(F.col("pks")))
        keys = ["database", "table", "__pk"]
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return out.drop("__pk") if not key_cols else out
