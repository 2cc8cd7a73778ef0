"""Invariants for the stateful token-bucket rate limiter.

- Sequential replay: the streamed decisions equal a local Python
  token-bucket replay per user (the same truth the recursive-CTE
  oracle states).
- The limiter discriminates: both admits and rejects occur.
- Cross-batch continuity: a decision whose event sits in the SECOND
  epoch (event_id > mid) can be a reject only because of state carried
  from earlier events — verify at least one such reject exists and
  matches the replay.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from gravity_spark.queries import REGISTRY, T, _RL_CAP, _RL_COST


def test_rate_limit_matches_sequential_replay(spark, sf_dir):
    rows = REGISTRY["streaming_rate_limit_stateful"].spark(spark, sf_dir).collect()
    got = {(r["user_id"], r["event_id"]): r["admitted"] for r in rows}
    ev = (
        T(spark, sf_dir, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .collect()
    )
    assert len(got) == len(ev)  # every event decided exactly once
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["us"], r["event_id"]))
    mid = max(r["event_id"] for r in ev) // 2
    expected = {}
    for u, es in by_user.items():
        es.sort()
        tokens, last = _RL_CAP, None
        for us, eid in es:
            if last is not None:
                tokens = min(_RL_CAP, tokens + (us - last))
            if tokens >= _RL_COST:
                adm, tokens = 1, tokens - _RL_COST
            else:
                adm = 0
            last = us
            expected[(u, eid)] = adm
    assert got == expected
    admits = sum(got.values())
    rejects = len(got) - admits
    assert admits > 0 and rejects > 0
    # at least one reject in epoch 2 whose cause is pre-split state
    assert any(
        adm == 0 and eid > mid for (u, eid), adm in got.items()
    ), "need a cross-batch-state-caused decision to grade continuity"


def test_rate_limit_multichunk_group_order(spark, tmp_path):
    """A user whose micro-batch exceeds one Arrow chunk
    (arrow.maxRecordsPerBatch) must still be replayed in
    (ts_us, event_id) order: applyInPandasWithState delivers the group
    as multiple chunks in shuffle order, so a per-chunk sort diverges
    from the sequential-replay oracle."""
    import json
    import random
    import uuid

    from gravity_spark.streaming.windows import rate_limit_stateful

    cap, cost = 10_000_000, 3_000_000  # 10 s capacity, 3 s per admit
    n, rng = 40, random.Random(7)
    times, us = [], 0
    for _ in range(n):
        us += rng.choice([1_000_000, 5_000_000])
        times.append(us)
    order = list(range(n))
    rng.shuffle(order)  # arrival order ≠ time order
    src = tmp_path / "s"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for i in order:
            f.write(json.dumps(
                {"user_id": 1, "event_id": i, "ts_us": times[i]}) + "\n")

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")  # 40 rows -> 6 chunks for the one group
    name = f"rlmc_{uuid.uuid4().hex[:8]}"
    try:
        stream = spark.readStream.schema(
            "user_id long, event_id long, ts_us long"
        ).json(str(src))
        q = (
            rate_limit_stateful(stream, cap, cost)
            .writeStream.format("memory").queryName(name)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set(key, old)

    got = {r["event_id"]: r["admitted"] for r in spark.table(name).collect()}
    tokens, last = cap, None
    exp = {}
    for i in sorted(range(n), key=lambda i: (times[i], i)):
        if last is not None:
            tokens = min(cap, tokens + (times[i] - last))
        if tokens >= cost:
            exp[i], tokens = 1, tokens - cost
        else:
            exp[i] = 0
        last = times[i]
    assert got == exp
    assert set(exp.values()) == {0, 1}  # both admits and rejects occurred
