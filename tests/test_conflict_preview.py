"""Conflict-preview engine (conflict_preview_engine.go:71-135 parity):
dry-run classification semantics and the no-target-mutation contract."""

import pytest
from pyspark.sql import functions as F

from gravity_spark.operators.upsert import (
    PREVIEW_CONFLICT,
    PREVIEW_DELETE_SKIP,
    PREVIEW_WOULD_DELETE,
    PREVIEW_WOULD_INSERT,
    PREVIEW_WOULD_UPDATE,
    preview_conflicts,
)


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)],
        "id long, name string, qty long",
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "id long, name string, qty long, old_name string, old_qty long, op string",
    )


def _outcomes(df):
    return {r["id"]: r["outcome"] for r in df.collect()}


def test_insert_classification(spark, target):
    ch = _changes(
        spark,
        [
            (1, "x", 1, None, None, "insert"),  # key exists → conflict
            (9, "n", 9, None, None, "insert"),  # fresh key → would_insert
        ],
    )
    out = _outcomes(preview_conflicts(target, ch, ["id"]))
    assert out == {1: PREVIEW_CONFLICT, 9: PREVIEW_WOULD_INSERT}


def test_update_classification(spark, target):
    ch = _changes(
        spark,
        [
            (1, "a2", 11, "a", 10, "update"),   # old image matches → would_update
            (2, "b2", 21, "WRONG", 20, "update"),  # old image stale → conflict
            (9, "z", 1, "z", 1, "update"),      # row gone → conflict
            (1, "a", 10, "a", 10, "update"),    # no-op: new image already present → conflict
            (3, "c", 31, None, 30, "update"),   # null-safe old match → would_update
        ],
    )
    got = [
        (r["id"], r["name"], r["outcome"])
        for r in preview_conflicts(target, ch, ["id"]).collect()
    ]
    assert sorted(got) == sorted(
        [
            (1, "a2", PREVIEW_WOULD_UPDATE),
            (2, "b2", PREVIEW_CONFLICT),
            (9, "z", PREVIEW_CONFLICT),
            (1, "a", PREVIEW_CONFLICT),
            (3, "c", PREVIEW_WOULD_UPDATE),
        ]
    )


def test_delete_classification_and_skip(spark, target):
    ch = _changes(
        spark,
        [
            (1, "a", 10, None, None, "delete"),    # full image matches → would_delete
            (2, "STALE", 20, None, None, "delete"),  # image differs → conflict
            (9, "z", 9, None, None, "delete"),     # row gone → conflict
        ],
    )
    out = _outcomes(preview_conflicts(target, ch, ["id"], enable_delete=True))
    assert out == {
        1: PREVIEW_WOULD_DELETE,
        2: PREVIEW_CONFLICT,
        9: PREVIEW_CONFLICT,
    }
    skipped = _outcomes(preview_conflicts(target, ch, ["id"], enable_delete=False))
    assert set(skipped.values()) == {PREVIEW_DELETE_SKIP}


def test_preview_never_mutates_target(spark, tmp_path):
    # materialize a parquet target, preview a mixed batch, and assert
    # the files are byte-identical before/after (the dry-run contract)
    path = str(tmp_path / "tgt")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, qty long"
    ).coalesce(1).write.parquet(path)

    import hashlib
    import pathlib

    def digest():
        h = hashlib.sha256()
        for p in sorted(pathlib.Path(path).rglob("*")):
            if p.is_file():
                h.update(p.name.encode())
                h.update(p.read_bytes())
        return h.hexdigest()

    before = digest()
    target = spark.read.parquet(path)
    ch = _changes(
        spark,
        [
            (1, "a2", 11, "a", 10, "update"),
            (2, "b", 20, None, None, "delete"),
            (5, "e", 50, None, None, "insert"),
        ],
    )
    result = preview_conflicts(target, ch, ["id"]).collect()
    assert len(result) == 3
    assert digest() == before
    # and the classified frame carries the audit schema: values + op + outcome
    cols = preview_conflicts(target, ch, ["id"]).columns
    assert cols == ["id", "name", "qty", "op", "outcome"]


def test_randomized_preview_matches_reference(spark):
    """Randomized preview oracle: classification of a random change
    batch against a random target must equal a sequential Python
    restatement of conflict_preview_engine.go's probe logic."""
    import random

    rng = random.Random(11)
    target_rows = [
        (k, rng.choice(["a", "b", None]), rng.randrange(5))
        for k in rng.sample(range(30), 18)
    ]
    tstate = {k: (n, q) for k, n, q in target_rows}
    target = spark.createDataFrame(target_rows, "id long, name string, qty long")

    changes = []
    for seq in range(120):
        k = rng.randrange(30)
        op = rng.choice(["insert", "update", "delete"])
        new = (rng.choice(["a", "b", "x", None]), rng.randrange(5))
        # old image: sometimes the true target image, sometimes junk
        if rng.random() < 0.5 and k in tstate:
            old = tstate[k]
        else:
            old = (rng.choice(["a", "b", None]), rng.randrange(5))
        changes.append((k, new[0], new[1], old[0], old[1], op))

    def ref(k, name, qty, old_name, old_qty, op):
        exists = k in tstate
        if op == "insert":
            return PREVIEW_CONFLICT if exists else PREVIEW_WOULD_INSERT
        if op == "update":
            if not exists or tstate[k] != (old_name, old_qty):
                return PREVIEW_CONFLICT
            return (
                PREVIEW_CONFLICT
                if tstate[k] == (name, qty)
                else PREVIEW_WOULD_UPDATE
            )
        return (
            PREVIEW_WOULD_DELETE
            if exists and tstate[k] == (name, qty)
            else PREVIEW_CONFLICT
        )

    df = spark.createDataFrame(
        changes, "id long, name string, qty long, old_name string, old_qty long, op string"
    )
    got = [
        (r["id"], r["name"], r["qty"], r["op"], r["outcome"])
        for r in preview_conflicts(target, df, ["id"]).collect()
    ]
    want = [
        (k, n, q, op, ref(k, n, q, on, oq, op))
        for k, n, q, on, oq, op in changes
    ]
    key = lambda t: tuple("" if x is None else str(x) for x in t)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
