import pytest

from gravity_spark.functions.multimodal import (
    decode_stub,
    documents_as_media,
    extract_features,
    frame_sample,
    resize_images,
)


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world document"), (2, "x" * 100)], "doc_id long, text string"
    )
    return documents_as_media(docs)


def test_extract_features_shapes(spark):
    media = _media(spark)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["n_bytes"] == len("hello world document")
    assert len(feats[1]["feature"]) == 8
    assert feats[1]["payload_sha"] != feats[2]["payload_sha"]


def test_resize_plumbing(spark):
    media = _media(spark)
    resized = {r["media_id"]: r for r in resize_images(media, 8, 4).collect()}
    for r in resized.values():
        assert len(r["payload"]) == 32
        assert (r["width"], r["height"]) == (8, 4)
    # deterministic: same input → same bytes
    again = {r["media_id"]: r for r in resize_images(media, 8, 4).collect()}
    assert resized[1]["payload"] == again[1]["payload"]


def test_frame_sample_counts(spark):
    from pyspark.sql import functions as F

    media = _media(spark).withColumn("duration_ms", F.lit(3500).cast("long"))
    frames = frame_sample(media, every_ms=1000).collect()
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(per_media[1]) == [0, 1000, 2000]


def test_unknown_kind_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "hologram")
