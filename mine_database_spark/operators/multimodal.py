"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The real decoders (PIL/torchaudio/ffmpeg) are not in this container, so the
decode step is STUBBED: `decode_image_real` raises NotImplementedError; the
default pipeline uses a deterministic fake decoder (md5-derived dimensions)
so the Spark-side plumbing — schema, batch shape, UDF signature,
partitioning — is real and testable, and the fake is reproducible in SQL
for the oracle gate.

Scale notes: binary payloads stay in Arrow buffers end-to-end (no Python
row loop); batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
so executor memory holds `batch × max_blob` bytes. Partition by content hash
for even blob-size distribution.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("blob", BinaryType(), True),
        StructField("media_type", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("blob_bytes", IntegerType(), False),
        StructField("fingerprint", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def decode_image_real(blob: bytes):
    """Production decode path — requires an image library.

    STUB: not available in this container. The contract is: bytes -> (width,
    height, pixel array); swap in PIL/turbojpeg here.
    """
    raise NotImplementedError("image decoding requires PIL/libjpeg — not in this container")


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: dimensions derived from the
    content hash (reproducible in SQL: md5 hex slices mod 1024/768 + 1)."""
    h = hashlib.md5(blob).hexdigest()
    return int(h[:4], 16) % 1024 + 1, int(h[4:8], 16) % 768 + 1


def extract_media_features(media: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """mapInPandas feature extraction over binary blobs (Arrow-batched)."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = pdf[blob_col].map(lambda b: bytes(b) if b is not None else b"")
            dims = blobs.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "blob_bytes": blobs.map(len).astype("int32"),
                    "fingerprint": blobs.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return media.select(F.col(id_col), F.col(blob_col)).mapInPandas(features, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: computes output metadata natively; the pixel
    transform itself would run in the decode UDF (stubbed)."""
    return media.withColumn("target_w", F.lit(target_w)).withColumn("target_h", F.lit(target_h))


def frame_sample_stub(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no) rows for a
    deterministic fake frame count (blob_bytes // 1024 frames)."""
    return (
        media.withColumn("n_frames", (F.length(F.col("blob")) / 1024).cast("int") + 1)
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_no"),
        )
    )
