"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The Spark-side contract is real and tested — schema, partition-friendly
batch shape, Arrow-batched UDF signatures. The actual codec work (PIL/
ffmpeg/torchaudio) is NOT in this container, so decode is stubbed behind
``DECODERS`` with a deterministic fake; swapping in a real decoder is a
one-line registration, the distributed plumbing is unchanged.

Scale notes: media bytes ride a `binary` column, so Parquet keeps them
out of unrelated scans (column pruning) and `maxPartitionBytes` keeps
task inputs bounded. Feature extraction uses mapInPandas — per-batch
Python cost amortized over the Arrow batch, never per-row.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried beside the opaque payload
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image / audio / video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),    # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 moments of the byte
    stream. Replace via ``DECODERS[kind] = real_fn`` when codec libs are
    available."""
    if payload is None:
        return []
    n = len(payload) or 1
    s = sum(payload)
    return [
        float(n),
        s / n,
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(min(payload)),
        float(max(payload)),
        float(s % 997),
        float((s * 31) % 991),
    ]


DECODERS: dict[str, Callable[[bytes, str], list[float]]] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def decode_stub(payload: bytes, kind: str) -> list[float]:
    fn = DECODERS.get(kind)
    if fn is None:
        raise NotImplementedError(
            f"no decoder registered for kind={kind!r}; real codec libs "
            "(PIL/ffmpeg) are not in this container — register one in "
            "gravity_spark.functions.multimodal.DECODERS"
        )
    return fn(payload, kind)


def extract_features(media: DataFrame, decoders: dict | None = None) -> DataFrame:
    """mapInPandas feature extraction over the media table.

    Arrow delivers the binary column in batches; each batch is decoded
    in one Python call per ~10k rows, not per row.

    The default closure is fully self-contained (no module-global
    references) so it unpickles on executor workers regardless of their
    sys.path — custom ``decoders`` must be importable on workers.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def fake(payload: bytes, kind: str) -> list:
            if payload is None:
                return []
            n = len(payload) or 1
            s = sum(payload)
            return [
                float(n), s / n,
                float(payload[0]) if n else 0.0,
                float(payload[-1]) if n else 0.0,
                float(min(payload)), float(max(payload)),
                float(s % 997), float((s * 31) % 991),
            ]

        for pdf in it:
            if decoders is None:
                feats = [fake(b, k) for b, k in zip(pdf["payload"], pdf["kind"])]
            else:
                feats = [decoders[k](b, k) for b, k in zip(pdf["payload"], pdf["kind"])]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "payload_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/harness: treat document text bytes as an
    opaque payload so the multimodal plumbing is exercised on the
    driver's testdata (no real media files in the container)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: mapInPandas over the binary payload.

    The real decoder/rescaler (PIL) is not in this container, so the
    transform is a deterministic stand-in — payload resampled to
    width*height bytes by index scaling — while the Spark-side contract
    (schema preserved, width/height metadata updated, Arrow batching)
    is the real one. Swap the inner function for PIL when available.
    """
    out_schema = media.schema

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        target = width * height

        def fake_resize(payload: bytes) -> bytes:
            if payload is None or len(payload) == 0:
                return payload
            n = len(payload)
            # nearest-neighbor resample of the byte stream
            return bytes(payload[(i * n) // target] for i in range(target))

        for pdf in it:
            out = pdf.copy()
            out["payload"] = out["payload"].map(fake_resize)
            out["width"] = width
            out["height"] = height
            yield _pd.DataFrame(out)

    return media.mapInPandas(batches, out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed — emits frame offsets only)."""
    n_frames = F.floor(F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        media.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_idx", F.col("frame_idx").cast("long"))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )
