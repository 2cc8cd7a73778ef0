"""Randomized CDC workload oracle (SURVEY §5.3): seeded random
insert/update/delete batches applied through the merge engines must
equal a sequential Python state machine — the rebuild's CHECKSUM TABLE
equivalent (pkg/mysql_test/generator.go:20-255 semantics)."""

import random

from gravity_spark.operators.upsert import (
    ENGINE_INSERT_IGNORE,
    ENGINE_REPLACE,
    merge_changes,
)


def _workload(seed: int, n_ops: int = 300, n_keys: int = 40):
    rng = random.Random(seed)
    ops = []
    for seq in range(n_ops):
        key = rng.randrange(n_keys)
        op = rng.choices(["insert", "update", "delete"], weights=[0.3, 0.5, 0.2])[0]
        ops.append((key, f"v{seq}", float(seq), op, seq))
    return ops


def _sequential_replace(state: dict, ops):
    for key, name, bal, op, seq in ops:
        if op == "delete":
            state.pop(key, None)
        else:
            state[key] = (name, bal)
    return state


def _sequential_insert_ignore(state: dict, ops):
    for key, name, bal, op, seq in ops:
        if op == "delete":
            state.pop(key, None)
        elif key not in state:
            state[key] = (name, bal)
    return state


def _run_engine(spark, ops, engine, batch_size=75):
    target = spark.createDataFrame([], "id long, name string, bal double")
    for i in range(0, len(ops), batch_size):
        batch = spark.createDataFrame(
            ops[i : i + batch_size], "id long, name string, bal double, op string, seq long"
        )
        target = merge_changes(target, batch, ["id"], engine)
        # checkpoint the lineage every batch like the real sink does
        target = spark.createDataFrame(target.collect(), target.schema)
    return {r["id"]: (r["name"], r["bal"]) for r in target.collect()}


def test_randomized_replace_engine(spark):
    for seed in (7, 42):
        ops = _workload(seed)
        expected = _sequential_replace({}, ops)
        got = _run_engine(spark, ops, ENGINE_REPLACE)
        assert got == expected, f"seed={seed}"


def test_randomized_insert_ignore_engine(spark):
    for seed in (7, 42):
        ops = _workload(seed)
        expected = _sequential_insert_ignore({}, ops)
        got = _run_engine(spark, ops, ENGINE_INSERT_IGNORE)
        assert got == expected, f"seed={seed}"


def test_batch_boundary_invariance(spark):
    # the same op stream applied in different batch sizes converges to
    # the same state (micro-batch boundaries are semantically invisible)
    ops = _workload(123, n_ops=200)
    a = _run_engine(spark, ops, ENGINE_REPLACE, batch_size=200)
    b = _run_engine(spark, ops, ENGINE_REPLACE, batch_size=17)
    assert a == b


def test_randomized_conflict_detect_engine(spark):
    """Randomized CAS oracle for the conflict-detect engine
    (conflict_engine.go:25-300 semantics): per batch, the LAST change
    per key is CAS'd against the batch-start target image; stale-image
    updates are dropped and audited, inserts/deletes never conflict.
    The sequential Python model is the truth; ~20%% of generated old
    images are deliberately corrupted, and intra-batch double updates
    self-conflict (the second's old image reflects the first, which the
    batch-start CAS rejects) — both paths must match exactly."""
    from gravity_spark.operators.upsert import merge_with_conflict_detect

    def workload(seed, n_ops=240, n_keys=30):
        rng = random.Random(seed)
        view = {}  # optimistic writer's view (applies everything)
        ops = []
        for seq in range(n_ops):
            key = rng.randrange(n_keys)
            op = rng.choices(["insert", "update", "delete"], weights=[0.3, 0.5, 0.2])[0]
            old = view.get(key, (None, None))
            if rng.random() < 0.2:  # stale/corrupt pre-image
                old = (f"stale{seq}", -1.0)
            ops.append((key, f"v{seq}", float(seq), old[0], old[1], op, seq))
            if op == "delete":
                view.pop(key, None)
            else:
                view[key] = (f"v{seq}", float(seq))
        return ops

    def sequential(ops, batch_size):
        state, conflicts = {}, []
        for i in range(0, len(ops), batch_size):
            batch = ops[i : i + batch_size]
            last = {}
            for t in batch:
                last[t[0]] = t  # seq order: later op wins the collapse
            for key, (k, name, bal, old_name, old_bal, op, seq) in sorted(last.items()):
                if op == "update" and key in state and state[key] != (old_name, old_bal):
                    conflicts.append((key, name, bal, op))
                elif op == "delete":
                    state.pop(key, None)
                else:
                    state[key] = (name, bal)
        return state, sorted(conflicts)

    schema = ("id long, name string, bal double, old_name string, "
              "old_bal double, op string, seq long")
    for seed in (3, 99):
        ops = workload(seed)
        batch_size = 60
        state = spark.createDataFrame([], "id long, name string, bal double")
        all_conflicts = []
        for i in range(0, len(ops), batch_size):
            batch = spark.createDataFrame(ops[i : i + batch_size], schema)
            state, conf = merge_with_conflict_detect(state, batch, ["id"])
            all_conflicts += [
                (r["id"], r["name"], r["bal"], r["op"]) for r in conf.collect()
            ]
            state = spark.createDataFrame(state.collect(), state.schema)
        got_state = {r["id"]: (r["name"], r["bal"]) for r in state.collect()}
        exp_state, exp_conflicts = sequential(ops, batch_size)
        assert got_state == exp_state, f"seed={seed}"
        assert sorted(all_conflicts) == exp_conflicts, f"seed={seed}"
