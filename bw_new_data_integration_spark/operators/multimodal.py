"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media payloads are opaque ``binary`` columns plus a typed metadata
struct; all decode/feature work runs as Arrow-batched ``mapInPandas``
so the heavy bytes never leave the executor and flow batch-at-a-time.

The decode kernels themselves are STUBBED — the image/audio libraries
are not in this container — behind ``_decode_image_stub`` etc., which
produce deterministic fake features. The Spark-side contract (schemas,
batch iteration, partitioning, UDF signatures) is real and tested;
swapping a stub for PIL/librosa is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried beside every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

IMAGE_FEATURE_DIM = 16


def _decode_image_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decoded features': md5-seeded floats.

    Real implementation would be PIL/turbojpeg decode + resize +
    channel stats; not available in this container.
    """
    if payload is None:
        raise NotImplementedError("image decode requires a payload")
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:IMAGE_FEATURE_DIM]]


def attach_media_meta(df: DataFrame, payload_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    ).withColumn("payload_sha", F.sha2(F.col(payload_col), 256))


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Per-image feature vector via Arrow-batched mapInPandas.

    Output: (id, features array<double>). Batches stream through the
    Python worker; partition count controls decode parallelism — at
    scale, ``repartition`` by a uniform key first so decode work
    balances across executors.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [_decode_image_stub(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling contract: one output row per sampled frame with
    (media_id, frame_idx, frame_ts_ms, frame_payload). Decode is
    stubbed (deterministic slices of the payload hash); the explode
    shape and schema are the real contract.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.sha256(payload).digest()
                n = min(max_frames, max(1, len(payload) // 64))
                for i in range(n):
                    rows.append((mid, i, i * every_ms, digest))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_ts_ms", "frame_payload"])

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


AUDIO_SAMPLE_RATE = 16_000  # Hz, assumed mono 16-bit PCM for the stub


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Per-clip audio features via Arrow-batched mapInPandas.

    Output: (id, duration_ms, amp_mean, amp_peak). Decode is STUBBED
    (librosa/soundfile not in this container): duration derives from
    the payload size under the assumed PCM format, amplitude stats are
    md5-seeded — deterministic, so the SQL oracle replays them. The
    schema/batching contract is the real deliverable; swapping in a
    real decoder is a one-function change.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("amp_mean", T.DoubleType(), True),
            T.StructField("amp_peak", T.DoubleType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.md5(payload).digest()
                duration_ms = len(payload) * 1000 // (AUDIO_SAMPLE_RATE * 2)
                rows.append((mid, duration_ms, digest[0] / 255.0, digest[1] / 255.0))
            yield pd.DataFrame(rows, columns=[id_col, "duration_ms", "amp_mean", "amp_peak"])

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)
