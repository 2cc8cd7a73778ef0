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
