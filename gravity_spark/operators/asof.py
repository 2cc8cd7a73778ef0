"""As-of (backward) join — an operator Spark lacks natively.

Implemented as the union-sort trick, not a windowed cross join: left and
right rows are unioned into one relation, sorted per key by event time,
and each left row picks up the most recent right id via
``last(..., ignorenulls=True)``. One shuffle on the key, linear work —
survives 100× scale-up where a per-key cross join would not.

Semantics: for each left row, the right row with the greatest
(right_ts, right_id) such that right_ts <= left_ts (inclusive,
backward-looking). Left rows with no prior right row keep NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
) -> DataFrame:
    """Backward as-of join; returns all left columns + ``right_id``."""
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("__rid"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != on],
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_id).alias("__rid"),
    ).select(*l.columns)  # align column order

    unioned = l.unionByName(r)
    # right rows sort before left rows at equal ts (inclusive bound);
    # among right rows at equal ts the highest id wins (last in order)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__is_left"), F.col("__rid").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.withColumn(right_id, F.last("__rid", ignorenulls=True).over(w))
    return out.filter(F.col("__is_left") == 1).select(*left_cols, right_id)
