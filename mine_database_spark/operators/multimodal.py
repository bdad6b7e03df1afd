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


def binary_dedup(
    media: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """Exact dedup of binary payloads with NO decode step — the multimodal
    dedup tier that works today even though image decode is dep-gated
    (decode_image_real above): identical bytes are identical media
    regardless of what they encode. Mirrors the reference's binary-blob
    ingestion need (SDF mol blocks imported as opaque blobs,
    compound_io.py:278 import_sdf).

    Per input row: (id, digest, n_copies, keep) where digest = sha2-256
    over the raw bytes, n_copies the group size, and keep marks the
    group's min-id survivor (same first-wins rule as exact_dedup; `min`
    on the id is type-agnostic — string ids work).

    Scale: ONE digest-keyed shuffle for the group stats plus the join
    back on the same key (co-partitioned — no second full shuffle of the
    hashed side under AQE). Blobs themselves never shuffle: only the
    fixed 64-char digest and the id leave the scan."""
    h = media.select(
        F.col(id_col), F.sha2(F.col(blob_col), 256).alias("digest")
    )
    # group key coalesces NULL digests (null blobs) to a sentinel: a plain
    # inner join on the digest would silently drop them (NULL never equals
    # NULL in a join key); with the sentinel they form their own group and
    # surface with digest NULL in the output
    hk = h.withColumn("__k", F.coalesce("digest", F.lit("\x00null")))
    groups = hk.groupBy("__k").agg(
        F.min(id_col).alias("__keeper"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )
    return hk.join(groups, "__k").select(
        F.col(id_col),
        "digest",
        "n_copies",
        (F.col(id_col) == F.col("__keeper")).alias("keep"),
    )


def binary_profile(
    media: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    magic_bytes: int = 4,
) -> DataFrame:
    """Format census over a binary column with NO decode: one row per
    magic prefix (the first `magic_bytes` bytes, hex — what file(1) keys
    on: ffd8ff=JPEG, 89504e47=PNG, ...), with blob count, distinct
    payloads, and size stats. The profile a pipeline runs on a new media
    source before routing blobs to typed decoders; NULL blobs group under
    a NULL prefix so missing payloads are visible, not dropped.

    Scale: scan-side prefix/length/digest expressions + one small
    groupBy(prefix) — aggregation state is O(formats), not O(blobs);
    n_distinct carries sha2 digests (fixed 64 chars), never payloads. At
    100 TB switch n_distinct to approx_count_distinct the same way
    profile_table does."""
    if magic_bytes < 1:
        raise ValueError(f"magic_bytes must be >= 1, got {magic_bytes}")
    b = media.select(
        F.hex(
            F.expr(f"substring({blob_col}, 1, {int(magic_bytes)})")
        ).alias("magic_hex"),
        F.length(F.col(blob_col)).cast("bigint").alias("nbytes"),
        F.sha2(F.col(blob_col), 256).alias("digest"),
    )
    return (
        b.groupBy("magic_hex")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blobs"),
            F.count_distinct("digest").cast("bigint").alias("n_distinct"),
            F.min("nbytes").alias("min_bytes"),
            F.max("nbytes").alias("max_bytes"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy(F.col("n_blobs").desc(), "magic_hex")
    )
