"""Epoch-geometry assertions for the streaming bench rows (r8 verdict
tasks 2 and 6): a foreachBatch/availableNow query whose micro-batch
count drifts measures trigger geometry, not compute — the r8 bench
disagreed with itself 2.4x on `streaming_stream_join` for exactly this
reason. Every row here pins its EXACT expected geometry, so any future
trigger-planning change (file-listing order, no-data-batch policy,
maxFilesPerTrigger behavior) becomes a test failure instead of a bench
mystery. Geometry is recorded by `queries._await_stream` into
`queries.STREAM_GEOMETRY` from the terminated query's recentProgress.
"""

import pytest

from gravity_spark import queries as Q


def _geom(spark, sf_dir, name):
    Q.STREAM_GEOMETRY.clear()
    df = Q.REGISTRY[name].spark(spark, sf_dir)
    df.count()  # streams already ran inside the query fn; force the read too
    assert "__last__" in Q.STREAM_GEOMETRY, f"{name} recorded no geometry"
    return Q.STREAM_GEOMETRY["__last__"]


def test_stream_join_single_data_batch(spark, sf_dir):
    # inner join runs with no-data micro-batches disabled (eviction-only
    # trailing batch, no output contribution): exactly 1 batch total
    g = _geom(spark, sf_dir, "streaming_stream_join")
    assert g == {"batches": 1, "data_batches": 1, "nodata_batches": 0}


def test_stream_outer_join_flush_batch(spark, sf_dir):
    # left-outer NEEDS the trailing no-data batch — it is the null-side
    # flush: exactly 1 data batch + 1 flush batch
    g = _geom(spark, sf_dir, "streaming_stream_outer_join")
    assert g["data_batches"] == 1
    assert g["batches"] == 2


def test_window_counts_single_batch(spark, sf_dir):
    g = _geom(spark, sf_dir, "streaming_window_counts")
    assert g["data_batches"] == 1
    assert g["batches"] == 1


def test_late_data_audit_three_epochs(spark, sf_dir):
    # three files fed through maxFilesPerTrigger=1: the admitted/late
    # SEMANTICS depend on this sequencing (epoch A sets the watermark
    # before B and C arrive), so geometry drift here is a correctness
    # bug, not just a bench one
    g = _geom(spark, sf_dir, "streaming_late_data_audit")
    assert g["data_batches"] == 3


def test_replayed_epoch_exactly_two(spark, sf_dir):
    # 2 files (original + byte-identical redelivery) x maxFilesPerTrigger=1:
    # the idempotence claim is "epoch 2 re-applies epoch 1's merge" — it
    # must actually BE two separate merge epochs
    g = _geom(spark, sf_dir, "cdc_replayed_epoch_idempotent")
    assert g["data_batches"] == 2


def test_cdc_pipeline_single_epoch(spark, sf_dir):
    # one parquet file, trigger once: the whole feed lands in one merge
    g = _geom(spark, sf_dir, "streaming_cdc_pipeline")
    assert g["data_batches"] == 1


def test_scd2_maintain_exactly_two_epochs(spark, sf_dir):
    # 2 seq-split files x maxFilesPerTrigger=1: the SCD2 maintenance is
    # specifically a two-epoch history build (close-then-open per key
    # across the seq midpoint), so the epoch count is semantic here too
    g = _geom(spark, sf_dir, "streaming_scd2_maintain")
    assert g["data_batches"] == 2
