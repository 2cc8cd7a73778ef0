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
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join; returns all left columns + ``right_id``.

    direction='backward' (default): greatest (right_ts, right_id) with
    right_ts <= left_ts. direction='forward': least (right_ts, right_id)
    with right_ts >= left_ts (pandas merge_asof parity). With
    ``tolerance_seconds``, matches farther than the tolerance from the
    left timestamp are nulled out — same union-sort pass, the matched
    right timestamp rides along in a struct, so tolerance costs nothing
    extra."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = left.columns
    rid_t = right.schema[right_id].dataType
    rts_t = right.schema[right_ts].dataType
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rid_t).alias("__rid"),
        F.lit(None).cast(rts_t).alias("__rts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != on],
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_id).alias("__rid"),
        F.col(right_ts).alias("__rts"),
    ).select(*l.columns)  # align column order

    unioned = l.unionByName(r)
    if direction == "backward":
        # right rows sort before left rows at equal ts (inclusive
        # bound); among right rows at equal ts the highest id wins
        # (last in order); pick = last non-null looking backward
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__ts"), F.col("__is_left"), F.col("__rid").asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick_id = F.last("__rid", ignorenulls=True).over(w)
        pick_ts = F.last("__rts", ignorenulls=True).over(w)
        within = (
            None
            if tolerance_seconds is None
            else (
                F.unix_micros(F.col("__ts").cast("timestamp"))
                - F.unix_micros(F.col("__mts").cast("timestamp"))
            )
            <= tolerance_seconds * 1_000_000
        )
    else:
        # left rows sort before right rows at equal ts (inclusive
        # bound); among right rows at equal ts the lowest id wins
        # (first in order); pick = first non-null looking forward
        w = (
            Window.partitionBy(on)
            .orderBy(
                F.col("__ts"), F.col("__is_left").desc(), F.col("__rid").asc_nulls_last()
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick_id = F.first("__rid", ignorenulls=True).over(w)
        pick_ts = F.first("__rts", ignorenulls=True).over(w)
        within = (
            None
            if tolerance_seconds is None
            else (
                F.unix_micros(F.col("__mts").cast("timestamp"))
                - F.unix_micros(F.col("__ts").cast("timestamp"))
            )
            <= tolerance_seconds * 1_000_000
        )
    out = unioned.withColumn("__mid", pick_id).withColumn("__mts", pick_ts)
    if within is not None:
        out = out.withColumn(
            "__mid", F.when(within, F.col("__mid")).otherwise(F.lit(None).cast(rid_t))
        )
    return (
        out.filter(F.col("__is_left") == 1)
        .withColumn(right_id, F.col("__mid"))
        .select(*left_cols, right_id)
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
) -> DataFrame:
    """applyInPandas variant: per-key pd.merge_asof. Same semantics as
    asof_join (backward, inclusive, highest right_id on ts ties).

    Exists for the operator-authoring pattern (SURVEY §2.5 UDF slot) and
    as a cross-check; the union-sort version is the default — it stays
    JVM-side and has no per-group Python cost.
    """
    import pandas as pd

    from pyspark.sql import types as T

    out_fields = [f for f in left.schema.fields] + [
        T.StructField(right_id, right.schema[right_id].dataType, True)
    ]
    out_schema = T.StructType(out_fields)
    l_cols = left.columns

    def per_key(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(l_pdf) == 0:
            return pd.DataFrame(columns=[*l_cols, right_id])
        l_sorted = l_pdf.sort_values(left_ts, kind="mergesort")
        if len(r_pdf) == 0:
            l_sorted = l_sorted.copy()
            l_sorted[right_id] = None
            return l_sorted[[*l_cols, right_id]]
        # ties: merge_asof takes the LAST row at equal ts, so sorting by
        # (ts, right_id) makes the highest id win — same as asof_join
        r_sorted = r_pdf.sort_values([right_ts, right_id], kind="mergesort")
        merged = pd.merge_asof(
            l_sorted,
            r_sorted[[right_ts, right_id]],
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[[*l_cols, right_id]]

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(per_key, out_schema)
