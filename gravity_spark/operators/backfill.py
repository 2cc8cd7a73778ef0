"""Backfill (padder): replay a CDC segment to repair missed writes.

Reference parity: padder/ + cmd/padder — replays a binlog range into
the target to "pad" writes the pipeline missed.

Spark design: replay is a seq-guarded merge — a replayed change applies
only where the target has no NEWER state for that key. The target keeps
a `__seq` high-water column per row (maintained by the normal sink when
backfill support is enabled); replaying any historical segment is then
idempotent and can never regress newer data — strictly safer than the
reference's raw REPLACE INTO replay.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gravity_spark.operators.collapse import collapse_last_write_wins

SEQ_COL = "__seq"


def with_seq(target: DataFrame, seq: int | None = None) -> DataFrame:
    """Add/refresh the per-row seq high-water column."""
    if SEQ_COL in target.columns:
        return target
    return target.withColumn(SEQ_COL, F.lit(seq if seq is not None else -1).cast("long"))


def replay_segment(
    target: DataFrame,
    changes: DataFrame,
    pk_cols: Sequence[str],
    seq_from: int,
    seq_to: int,
    op_col: str = "op",
    order_col: str = "seq",
) -> DataFrame:
    """Replay changes with seq in [seq_from, seq_to) into a seq-aware
    target. A replayed change wins only against strictly older state."""
    pk = list(pk_cols)
    if SEQ_COL not in target.columns:
        target = with_seq(target)
    value_cols = [c for c in target.columns if c != SEQ_COL]

    segment = changes.filter(
        (F.col(order_col) >= seq_from) & (F.col(order_col) < seq_to)
    )
    last = collapse_last_write_wins(segment, key_cols=pk, order_col=order_col)
    c = last.select(*value_cols, F.col(op_col), F.col(order_col).alias("__new_seq"))

    t = target.alias("t")
    cc = c.alias("c")
    joined = t.join(cc, on=pk, how="full_outer")

    newer = F.col("__new_seq") > F.coalesce(F.col(f"t.{SEQ_COL}"), F.lit(-(1 << 62)))
    from_change = F.col("__new_seq").isNotNull() & newer
    is_delete = F.col(op_col) == "delete"

    out_cols = []
    for col in value_cols:
        if col in pk:
            out_cols.append(F.coalesce(F.col(f"t.{col}"), F.col(f"c.{col}")).alias(col))
        else:
            out_cols.append(
                F.when(from_change, F.col(f"c.{col}")).otherwise(F.col(f"t.{col}")).alias(col)
            )
    out_cols.append(
        F.when(from_change, F.col("__new_seq")).otherwise(F.col(f"t.{SEQ_COL}")).alias(SEQ_COL)
    )
    merged = joined.select(*out_cols, F.when(from_change & is_delete, True).alias("__del"))
    # rows that exist only in the change set with op=delete, or target
    # rows overwritten by a newer delete, drop out
    return merged.filter(F.col("__del").isNull()).drop("__del")
