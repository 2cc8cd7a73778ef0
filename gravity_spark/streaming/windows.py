"""Streaming windowed aggregations + stateful operators.

Maps the reference's sliding-window/watermark machinery
(pkg/sliding_window/static_sliding_window.go:17-120) onto Structured
Streaming's native event-time windows. Stream/batch parity is the
correctness contract: the same windowed aggregation over the same rows
must equal the batch GROUP BY — which is how the harness oracles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 day",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark for late
    data (the reference assumes in-order streams and has no late-data
    story — withWatermark is the Spark upgrade, SURVEY §2.5)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def streaming_dedup(events: DataFrame, key_cols: list[str], watermark: str = "1 day",
                    ts_col: str = "ts") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon — the streaming
    form of exact dedup (dropDuplicates keeps state bounded by the
    watermark, so it survives unbounded streams)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState: one
    state cell per user carrying (session_count, last_ts). Emits one row
    per user per trigger with the running session count.

    This is the applyInPandasWithState replacement for the reference's
    gRPC-sidecar "arbitrary stateful plugin" slot (SURVEY §2.5 UDF row).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_sessions", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_sessions", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("last_ts", T.DoubleType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        n_sessions, n_events, last_ts = (
            state.get if state.exists else (0, 0, None)
        )
        # applyInPandasWithState delivers a group as MULTIPLE Arrow
        # chunks (arrow.maxRecordsPerBatch) in shuffle order — concat
        # and sort ONCE so the replay sees true time order even when a
        # user exceeds one chunk per micro-batch
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            for t in pdf["ts"]:
                epoch = t.timestamp()
                if last_ts is None or (epoch - last_ts) > gap_seconds:
                    n_sessions += 1
                last_ts = epoch
            n_events += len(pdf)
        state.update((n_sessions, n_events, last_ts))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def transform_with_state_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    wire protocol; absent in some runtimes, so the operator is gated."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_counts_stateful(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running event count via transformWithStateInPandas —
    Spark 4's typed stateful-processor API (ValueState handle), the
    successor slot for the reference's arbitrary-stateful-plugin
    surface alongside applyInPandasWithState. Emits one (key, n_events)
    row per key per trigger with the cumulative count.

    Requires protobuf at runtime (check transform_with_state_available()
    first); sessionize_stateful covers the same slot without it."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState(
                "count", T.StructType([T.StructField("n", T.LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame({key_col: [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=CountProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def minhash_bucket_gate(
    banded: DataFrame, id_col: str = "doc_id", salt_buckets: int | None = 1024
) -> DataFrame:
    """Streaming incremental near-dup gate, stage 1: stateful LSH-bucket
    ownership via applyInPandasWithState.

    State per bucket = the smallest doc id ever seen in it. Each
    incoming (doc, band, bucket) row emits (doc_id, owner) where owner
    is the smallest id in that bucket up to and including this doc
    (in-batch rows are processed in id order; the stream contract is
    id-ascending arrival, which CDC/ingest streams satisfy). Stage 2
    (per-doc verdict) is a per-batch aggregation in foreachBatch:
    is_new = min(owner over the doc's bands) == doc_id.

    State-key granularity is the throughput knob. applyInPandasWithState
    makes ONE Python call per state key per micro-batch; keyed directly
    by (band, bh) a 2,500-doc × 8-band batch pays 20k ~150 µs Python
    round-trips (~3 s/epoch, measured — the whole banding compute is
    0.5 s). ``salt_buckets=N`` coarsens the state key to
    hash(band, bh) % N; each key holds a bucket→owner map, so a batch
    pays ≤ N Python calls while per-bucket semantics are bit-identical
    (rows are regrouped per bucket inside the handler). The tradeoff is
    per-key state VALUE size: at corpus scale an HDFS-backed store
    rewrites a key's whole value per update, so a deployment whose
    occupied-bucket count is huge should pass ``salt_buckets=None`` —
    one long per bucket, billions of keys sharded across RocksDB state
    stores — while a bounded-state pipeline takes the salted fast path.
    Both paths are oracle-tested (tests/test_minhash_gate.py).

    Scale shape: state totals O(distinct buckets) ≈
    O(corpus/near-dup-rate) either way, hash-partitioned across state
    stores; each micro-batch shuffles only (band, bh, id) triples.
    This is the streaming twin of dedup_minhash_pairs' batch join
    (functions/dedup.py), filling the reference's arbitrary-stateful-
    plugin slot (SURVEY §2.2 gRPC sidecar)."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("owner", T.LongType()),
        ]
    )

    if salt_buckets is None:
        state_schema = T.StructType([T.StructField("min_id", T.LongType())])

        def fn(key, pdf_iter, state: GroupState):
            cur = state.get[0] if state.exists else None
            ids, owners = [], []
            # chunks arrive in shuffle order — gather the whole group
            # before sorting, or a >1-chunk bucket replays out of id order
            all_ids: list[int] = []
            for pdf in pdf_iter:
                all_ids.extend(pdf[id_col].tolist())
            for did in sorted(all_ids):
                owner = did if cur is None else min(cur, did)
                ids.append(did)
                owners.append(owner)
                cur = owner
            state.update((cur,))
            yield pd.DataFrame({"doc_id": ids, "owner": owners})

        return banded.groupBy("band", "bh").applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )

    import json

    # owners map rides as one JSON cell per salt key: bucket-name →
    # smallest id seen. Values are longs; JSON round-trips them exactly.
    state_schema = T.StructType([T.StructField("owners", T.StringType())])

    def fn_salted(key, pdf_iter, state: GroupState):
        owners_map: dict[str, int] = (
            json.loads(state.get[0]) if state.exists else {}
        )
        # regroup per REAL bucket with a plain dict — pandas
        # groupby/sort per call costs more than the per-key fan-in
        # saves (measured: it erased the whole win)
        buckets: dict[str, list] = {}
        for pdf in pdf_iter:
            for b, h, d in zip(
                pdf["band"].tolist(), pdf["bh"].tolist(), pdf[id_col].tolist()
            ):
                buckets.setdefault(f"{b}:{h}", []).append(d)
        out_ids: list[int] = []
        out_owners: list[int] = []
        for bk, ids in buckets.items():
            cur = owners_map.get(bk)
            # per-bucket id order (the gate's semantics)
            for did in sorted(ids):
                owner = did if cur is None else min(cur, did)
                out_ids.append(did)
                out_owners.append(owner)
                cur = owner
            owners_map[bk] = cur
        state.update((json.dumps(owners_map, separators=(",", ":")),))
        yield pd.DataFrame({"doc_id": out_ids, "owner": out_owners})

    keyed = banded.withColumn(
        "gk", F.pmod(F.xxhash64("band", "bh"), F.lit(salt_buckets))
    )
    return (
        keyed.groupBy("gk")
        .applyInPandasWithState(
            fn_salted, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
        .select("doc_id", "owner")
    )


def rate_limit_stateful(
    events: DataFrame,
    cap_utok: int,
    cost_utok: int,
) -> DataFrame:
    """Per-user token-bucket rate limiter as a custom stateful
    operator: one state cell per user carrying (tokens, last_ts_us) in
    integer micro-tokens where 1 µtok == 1 µs of refill — the bucket
    refills by exactly the elapsed microseconds, so every decision is
    pure BIGINT arithmetic (no float drift between the stream and the
    batch-replay oracle). An event is admitted iff
    min(cap, tokens + elapsed_us) >= cost; admitted events spend
    `cost_utok`. Buckets start full.

    This is the streaming twin of the batch `inventory_running_floor`
    ledger — the same clamp recurrence, but TWO-sided (cap above, zero
    below), which has no window closed form and therefore genuinely
    needs sequential per-key state: exactly the arbitrary-stateful slot
    applyInPandasWithState fills (the reference's gRPC-sidecar plugin
    surface, SURVEY §2.2).

    Emits one row per EVENT (user_id, event_id, admitted) — decision
    provenance, not just counters. Input must carry
    (user_id, event_id, ts_us); batches are processed in
    (ts_us, event_id) order within each user, and state persists across
    micro-batches, so any epoch split of a time-ordered feed converges
    to the same decisions (graded against a recursive-CTE replay)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("admitted", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("tokens", T.LongType()),
            T.StructField("last_us", T.LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        tokens, last_us = state.get if state.exists else (cap_utok, None)
        uids, eids, flags = [], [], []
        # concat the group's Arrow chunks and sort ONCE: chunks arrive
        # in shuffle order, so a per-chunk sort replays a >1-chunk user
        # out of time order and diverges from the recursive-CTE oracle
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for eid, us in zip(pdf["event_id"], pdf["ts_us"]):
                us = int(us)
                if last_us is not None:
                    tokens = min(cap_utok, tokens + (us - last_us))
                if tokens >= cost_utok:
                    admitted = 1
                    tokens -= cost_utok
                else:
                    admitted = 0
                last_us = us
                uids.append(int(key[0]))
                eids.append(int(eid))
                flags.append(admitted)
        state.update((tokens, last_us))
        yield pd.DataFrame(
            {"user_id": uids, "event_id": eids, "admitted": flags}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
