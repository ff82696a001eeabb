"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media payloads are opaque ``binary`` columns plus a typed metadata
struct; all decode/feature work runs as Arrow-batched ``mapInPandas``
so the heavy bytes never leave the executor and flow batch-at-a-time.

Real vs stubbed (container has no PIL/librosa):

* **Real**: container/header decode — :func:`parse_image_dims` walks
  actual PNG IHDR, JPEG SOFn markers, and GIF logical-screen bytes with
  stdlib ``struct``; :func:`extract_image_meta` runs it batch-wise over
  the binary column.  :func:`make_png` emits fully valid (zlib IDAT,
  CRC-correct) PNGs for fixtures/tests.
* **Stubbed**: pixel-level feature vectors (``_decode_image_stub``,
  md5-seeded floats) and audio sample decode — clearly separated so
  swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


# ---------------------------------------------------------------------------
# REAL container decode (stdlib-only): PNG IHDR / JPEG SOFn / GIF LSD.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG markers that carry frame dimensions (SOF0..SOF15 minus DHT/JPG/DAC)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def parse_image_dims(payload: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Parse ``(format, width, height)`` from real image bytes.

    Stdlib-only header decode — no PIL required:

    * PNG: signature + first chunk must be IHDR; width/height are the
      two big-endian u32s at offsets 16/20.
    * JPEG: walk the marker stream (skipping APPn/DQT/DHT/COM and
      entropy-free segments) to the first SOFn frame header; height and
      width are big-endian u16s at segment offsets 3/5.
    * GIF: GIF87a/GIF89a logical screen descriptor, little-endian u16s.

    Unknown/truncated payloads return ``(None, None, None)`` (or the
    format with null dims if the signature matched but the header was
    truncated) instead of raising — at 100 TB a corrupt blob must not
    kill the task.
    """
    if payload is None or len(payload) < 10:
        return (None, None, None)
    if payload[:8] == _PNG_SIG:
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        return ("png", None, None)
    if payload[:2] == b"\xff\xd8":
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:  # entropy-coded data / padding
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
                continue
            if i + 4 > n:
                break
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return ("jpeg", w, h)
                return ("jpeg", None, None)
            i += 2 + seglen
        return ("jpeg", None, None)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    return (None, None, None)


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """Build a REAL, fully valid grayscale PNG (fixture/test helper).

    Correct signature, IHDR, zlib-compressed filtered scanlines in
    IDAT, CRC on every chunk — decodable by any PNG reader, not just
    :func:`parse_image_dims`.
    """

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(
        b"\x00" + bytes(((x * 31 + y * 17 + seed) % 256) for x in range(width))
        for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg_header(width: int, height: int) -> bytes:
    """Build a structurally valid JPEG header stream (SOI, APP0/JFIF,
    DQT, SOF0, EOI) carrying real dimensions. Entropy-coded image data
    is omitted (a full baseline encoder needs Huffman tables beyond a
    fixture's scope) — the marker segments a header parser must walk
    and skip are all real.
    """
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    dqt = b"\x00" + bytes(range(1, 65))  # table 0, 64 byte entries
    sof0 = (
        struct.pack(">BHHB", 8, height, width, 1)  # precision, dims, 1 component
        + b"\x01\x11\x00"  # component 1, 1x1 sampling, qtable 0
    )

    def seg(marker: int, data: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(data) + 2) + data

    return b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, dqt) + seg(0xC0, sof0) + b"\xff\xd9"


def extract_image_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL header decode over a binary column via Arrow-batched
    mapInPandas: output (id, format, width, height) parsed from the
    actual bytes (PNG IHDR / JPEG SOFn / GIF). Bytes never leave the
    executor; corrupt payloads yield nulls, not task failures.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("format", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_image_dims(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


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
