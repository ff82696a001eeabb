"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media payloads are opaque ``binary`` columns plus a typed metadata
struct; all decode/feature work runs as Arrow-batched ``mapInPandas``
so the heavy bytes never leave the executor and flow batch-at-a-time.

Real vs stubbed (container has no PIL/librosa):

* **Real**: container/header decode — :func:`parse_image_dims` walks
  actual PNG IHDR, JPEG SOFn markers, and GIF logical-screen bytes with
  stdlib ``struct``; :func:`extract_image_meta` runs it batch-wise over
  the binary column.  :func:`make_png` emits fully valid (zlib IDAT,
  CRC-correct) PNGs for fixtures/tests. **Audio is fully real for PCM
  WAV**: :func:`parse_wav` walks actual RIFF/fmt/data chunks and
  :func:`extract_audio_features` computes amplitude stats from the
  actual int16 samples (numpy ``frombuffer``); :func:`make_wav` emits
  fully valid playable WAVs for fixtures.
  **Video container metadata is real**: :func:`parse_mp4` walks actual
  ISO-BMFF boxes (mvhd v0/v1, trak) for duration/timescale/tracks;
  :func:`make_mp4` emits size-consistent fixtures.
  **Pixel decode is real for all three image formats**:
  :func:`decode_png_gray` (zlib inflate + all-five-filters defilter),
  :func:`decode_gif_gray` (full variable-width LZW), and
  :func:`decode_jpeg_gray` / :func:`decode_jpeg_ycbcr` (baseline
  entropy decode: canonical Huffman from DHT, per-component DC
  prediction, AC run-length, dequant, 8×8 IDCT — grayscale AND
  YCbCr 4:4:4 color with MCU interleave + :func:`ycbcr_to_rgb`),
  stdlib + numpy only, with matching fixture encoders
  (:func:`make_png` / :func:`make_gif` / :func:`make_jpeg` /
  :func:`make_jpeg_color`).
  :func:`extract_image_pixel_stats` reduces any of them to
  integer-exact stats batch-wise, and :func:`extract_thumbnails`
  resizes decoded planes (:func:`resize_nearest`, integer-exact NN)
  into fixed thumbnails.
  **Video frame extraction is real for YUV4MPEG2**:
  :func:`iter_y4m_frames` / :func:`sample_y4m_frames` decode actual
  raw YUV planes from real y4m streams (:func:`make_y4m` emits
  ffmpeg-consumable fixtures) with presentation-time sampling.
* **Stubbed**: lossy AUDIO codecs (mp3/ogg → null stats),
  progressive/chroma-subsampled JPEG (baseline 1-comp + 4:4:4 only),
  the md5 feature-vector kernel (``_decode_image_stub`` behind
  ``extract_image_features``), and COMPRESSED-video frame extraction
  (``sample_video_frames`` payload slices — no codec in this
  container). These operator-level seams keep the real Spark contract
  (Arrow-batched ``mapInPandas``, schema, explode shape — pytest-
  covered) with only the decode kernel stubbed, so swapping in a full
  codec (libjpeg-turbo, ffmpeg) is a one-function change.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as _np  # pandas already hard-depends on numpy
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

#: Hard ceiling on pixels any in-repo decoder will materialize per
#: payload (~64 MPix, i.e. a 64 MB grayscale buffer). Headers declaring
#: more are treated as corrupt — a decoder must never let one hostile
#: blob balloon an executor's memory.
MAX_DECODE_PIXELS = 1 << 26


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
            # the PNG spec caps dimensions at 2^31-1; a header past that
            # (or zero) is corrupt — null dims, and downstream Int32
            # columns stay safe
            if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
                return ("png", None, None)
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
                    if w <= 0 or h <= 0:  # zero SOF dims are corrupt
                        return ("jpeg", None, None)
                    return ("jpeg", w, h)
                return ("jpeg", None, None)
            i += 2 + seglen
        return ("jpeg", None, None)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        if w <= 0 or h <= 0:  # zero logical-screen descriptor is corrupt
            return ("gif", None, None)
        return ("gif", w, h)
    return (None, None, None)


def make_png(width: int, height: int, seed: int = 0, filter_type: int = 0) -> bytes:
    """Build a REAL, fully valid grayscale PNG (fixture/test helper).

    Correct signature, IHDR, zlib-compressed filtered scanlines in
    IDAT, CRC on every chunk — decodable by any PNG reader, not just
    :func:`parse_image_dims`. Pixel (x, y) is ``(x*31 + y*17 + seed) %
    256`` — a formula a SQL oracle replays. ``filter_type`` selects the
    per-scanline PNG filter (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth)
    so the decoder's defilter paths can all be exercised; the encoded
    PIXELS are identical for every filter type."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    rows = [
        bytes(((x * 31 + y * 17 + seed) % 256) for x in range(width))
        for y in range(height)
    ]
    scanlines = []
    prev = bytes(width)
    for row in rows:
        if filter_type == 0:
            filtered = row
        elif filter_type == 1:  # Sub: delta vs left
            filtered = bytes((row[x] - (row[x - 1] if x else 0)) % 256 for x in range(width))
        elif filter_type == 2:  # Up: delta vs above
            filtered = bytes((row[x] - prev[x]) % 256 for x in range(width))
        elif filter_type == 3:  # Average
            filtered = bytes(
                (row[x] - ((row[x - 1] if x else 0) + prev[x]) // 2) % 256
                for x in range(width)
            )
        elif filter_type == 4:  # Paeth
            filtered = bytes(
                (row[x] - _paeth((row[x - 1] if x else 0), prev[x], (prev[x - 1] if x else 0)))
                % 256
                for x in range(width)
            )
        else:
            raise ValueError(f"unknown PNG filter type {filter_type}")
        scanlines.append(bytes([filter_type]) + filtered)
        prev = row
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): nearest of left/above/upper-left
    to a + b - c, ties broken left, above, upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_gray(payload: bytes | None):
    """REAL PNG pixel decode for 8-bit non-interlaced grayscale:
    chunk walk → concatenated IDAT → zlib inflate → per-scanline
    defilter (all five PNG filter types) → numpy (height, width) uint8
    array. Stdlib ``zlib``/``struct`` + numpy only — no PIL.

    Returns None for anything that is not a decodable 8-bit grayscale
    PNG (other color types/bit depths, interlaced, truncated,
    corrupt) — the corrupt-blob contract; pixel decode for
    lossy/other formats needs a codec not in this container.
    """
    import numpy as np

    if payload is None or payload[:8] != _PNG_SIG:
        return None
    pos, n = 8, len(payload)
    width = height = None
    idat = b""
    try:
        while pos + 8 <= n:
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + length]
            if len(body) < length:
                return None
            if typ == b"IHDR":
                if length < 13:
                    return None
                width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body[:13]
                )
                if depth != 8 or color != 0 or interlace != 0:
                    return None
            elif typ == b"IDAT":
                idat += body
            elif typ == b"IEND":
                break
            pos += 12 + length
        if not width or not height or not idat:
            return None
        if width * height > MAX_DECODE_PIXELS:
            return None  # absurd declared dims: don't even allocate
        stride = width + 1
        # bounded inflate: cap output at the pixel buffer size so a
        # hostile high-ratio deflate stream (decompression bomb) cannot
        # balloon executor memory — the corrupt-blob contract
        d = zlib.decompressobj()
        raw = d.decompress(idat, stride * height)
    except Exception:
        return None
    if len(raw) < stride * height:
        return None
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int32)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        ftype, data = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            row = data
        elif ftype == 2:
            row = (data + prev) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters are inherently sequential per line
            row = np.zeros(width, dtype=np.int32)
            left = 0
            for x in range(width):
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + int(prev[x])) // 2
                else:
                    pred = _paeth(left, int(prev[x]), int(prev[x - 1]) if x else 0)
                left = (int(data[x]) + pred) % 256
                row[x] = left
        else:
            return None
        out[y] = row
        prev = row
    return out


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


_DCT_CACHE = None


def _dct_matrix():
    global _DCT_CACHE
    if _DCT_CACHE is None:
        import numpy as np

        x = np.arange(8)
        c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
        c *= np.sqrt(2 / 8)
        c[0] = np.sqrt(1 / 8)
        _DCT_CACHE = c
    return _DCT_CACHE


def _formula_planes_zigzag(width: int, height: int, seed: int, nchan: int):
    """Vectorized fixture-image FDCT front end shared by the encoders:
    generates the ``(x*31 + y*17 + seed + 85*ch) % 256`` plane(s) with
    edge padding to 8×8 block multiples (index clipping ≡ np.pad edge
    mode), runs ONE batched orthonormal FDCT over every block of every
    channel, and returns (nblocks*nchan, 64) int64 zigzag coefficients
    in EMISSION order (MCU-interleaved: block-major, channel-minor) —
    byte-for-byte the same symbol stream the per-block loop produced."""
    import numpy as np

    C = _dct_matrix()
    bh, bw = (height + 7) // 8 * 8, (width + 7) // 8 * 8
    ys = np.minimum(np.arange(bh), height - 1)[None, :, None]
    xs = np.minimum(np.arange(bw), width - 1)[None, None, :]
    chs = np.arange(nchan)[:, None, None]
    planes = ((xs * 31 + ys * 17 + seed + 85 * chs) % 256).astype(np.float64)
    nby, nbx = bh // 8, bw // 8
    # (nchan, nby, 8, nbx, 8) -> (nby, nbx, nchan, 8, 8): MCU-interleaved
    blocks = planes.reshape(nchan, nby, 8, nbx, 8).transpose(1, 3, 0, 2, 4)
    coef = np.rint(C @ (blocks - 128.0) @ C.T)
    return coef.reshape(-1, 64)[:, _ZIGZAG_ARR].astype(np.int64)


def _jpeg_entropy_encode(zz, comp_of_block, set_of_comp, nsets):
    """Vectorized baseline-JPEG entropy encode (shared by
    :func:`make_jpeg` / :func:`make_jpeg_color`).

    ``zz``: (nb, 64) int64 zigzag coefficients in EMISSION order;
    ``comp_of_block``: per-row component index; ``set_of_comp``:
    component -> Huffman table-set index (luma/chroma). Returns
    ``(sets, data)`` with ``sets[i] = (dc_bits, dc_vals, ac_bits,
    ac_vals)`` for the DHT segments and ``data`` the stuffed
    entropy-coded bytes. The whole pipeline — per-component DC
    prediction, AC run-length with ZRL/EOB, canonical fixed-length-8
    code assignment, MSB bit packing with 1-padding and 0xFF00
    stuffing — runs as numpy array ops; output is byte-identical to
    the former per-symbol Python loop (verified at swap-in)."""
    import numpy as np

    nb = zz.shape[0]
    comp_of_block = np.asarray(comp_of_block)
    set_of_block = np.asarray(set_of_comp)[comp_of_block]

    def bit_sizes(v):  # vectorized _bit_size: frexp exponent of |v|
        return np.frexp(np.abs(v).astype(np.float64))[1].astype(np.int64)

    # DC: sequential prediction per component (emission order preserves
    # each component's scan order)
    dc_diff = np.empty(nb, np.int64)
    for c in range(int(comp_of_block.max()) + 1 if nb else 0):
        rows = np.flatnonzero(comp_of_block == c)
        dc_diff[rows] = np.diff(zz[rows, 0], prepend=0)
    dc_cat = bit_sizes(dc_diff)

    # AC: run-length over zz[:,1:], rows flattened row-major
    ac = zz[:, 1:]
    nz_r, nz_c = np.nonzero(ac)
    nnz = len(nz_r)
    prev_c = np.empty(nnz, np.int64)
    if nnz:
        prev_c[0] = -1
        prev_c[1:] = np.where(nz_r[1:] == nz_r[:-1], nz_c[:-1], -1)
    run = nz_c - prev_c - 1
    zrl_n = run >> 4  # ZRL expansions for runs > 15
    ac_val = ac[nz_r, nz_c]
    ac_size = bit_sizes(ac_val)
    ac_sym = ((run & 15) << 4) | ac_size
    last_c = np.full(nb, -1, np.int64)
    last_c[nz_r] = nz_c  # last write per row = its final nonzero
    eob_rows = np.flatnonzero(last_c != 62)  # trailing zeros -> EOB

    # emission order via per-symbol sort keys: row*1000 + position
    # (DC=0; ZRL j of the nonzero at col c -> 1+8c+j, its AC -> 1+8c+7;
    # EOB=600 — ZRL fan-out <= 3 so slots never collide)
    n_zrl = int(zrl_n.sum())
    if n_zrl:
        starts = np.cumsum(zrl_n) - zrl_n
        j = np.arange(n_zrl) - np.repeat(starts, zrl_n)
        zrl_key = np.repeat(nz_r, zrl_n) * 1000 + 1 + np.repeat(nz_c, zrl_n) * 8 + j
    else:
        zrl_key = np.empty(0, np.int64)
    n_eob = len(eob_rows)
    zeros_tail = np.zeros(n_zrl + n_eob, np.int64)
    keys = np.concatenate(
        [
            np.arange(nb, dtype=np.int64) * 1000,
            nz_r * 1000 + 1 + nz_c * 8 + 7,
            zrl_key,
            eob_rows * 1000 + 600,
        ]
    )
    syms = np.concatenate(
        [dc_cat, ac_sym, np.full(n_zrl, 0xF0, np.int64), np.zeros(n_eob, np.int64)]
    )
    sizes = np.concatenate([dc_cat, ac_size, zeros_tail])
    amps = np.concatenate([dc_diff, ac_val, zeros_tail])
    is_dc = np.zeros(len(keys), bool)
    is_dc[:nb] = True
    order = np.argsort(keys)
    syms, sizes, amps, is_dc = syms[order], sizes[order], amps[order], is_dc[order]
    set_idx = set_of_block[keys[order] // 1000]

    # canonical fixed-length-8 tables over the symbols actually used
    # (valid per the format: DHT carries them; <= 255 codes)
    sets = []
    dc_code_arr = np.zeros((nsets, 256), np.int64)
    ac_code_arr = np.zeros((nsets, 256), np.int64)
    for s in range(nsets):
        m = set_idx == s
        dc_vals = np.unique(syms[m & is_dc]).tolist()
        ac_u = syms[m & ~is_dc]
        ac_vals = np.unique(ac_u).tolist() if len(ac_u) else [0x00]
        assert len(dc_vals) <= 255 and len(ac_vals) <= 255
        dc_bits, ac_bits = [0] * 17, [0] * 17
        dc_bits[8], ac_bits[8] = len(dc_vals), len(ac_vals)
        dc_code_arr[s, dc_vals] = np.arange(len(dc_vals))
        ac_code_arr[s, ac_vals] = np.arange(len(ac_vals))
        sets.append((dc_bits, dc_vals, ac_bits, ac_vals))
    code_val = np.where(is_dc, dc_code_arr[set_idx, syms], ac_code_arr[set_idx, syms])

    # amplitudes: one's-complement negatives, then MSB-first packing of
    # interleaved (code, 8) / (amplitude, size) emissions
    amp_enc = np.where(amps > 0, amps, amps + (1 << sizes) - 1)
    amp_enc = np.where(sizes > 0, amp_enc, 0)
    n = len(syms)
    vals2 = np.empty((n, 2), np.int64)
    vals2[:, 0], vals2[:, 1] = code_val, amp_enc
    nbits2 = np.empty((n, 2), np.int64)
    nbits2[:, 0], nbits2[:, 1] = 8, sizes
    flat_vals, flat_nbits = vals2.reshape(-1), nbits2.reshape(-1)
    bitmat = ((flat_vals[:, None] >> np.arange(15, -1, -1)) & 1).astype(np.uint8)
    flat_bits = bitmat[np.arange(16) >= (16 - flat_nbits[:, None])]
    pad = (-len(flat_bits)) % 8
    if pad:  # pad the final byte with 1-bits, as the spec suggests
        flat_bits = np.concatenate([flat_bits, np.ones(pad, np.uint8)])
    data = np.packbits(flat_bits).tobytes().replace(b"\xff", b"\xff\x00")
    return sets, data


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def make_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """Build a REAL baseline JPEG (grayscale, fixture/test helper):
    level shift → 8×8 orthonormal FDCT → unit quantization → zigzag →
    DC-differential + AC run-length symbols → canonical Huffman
    (tables are *generated* and embedded in DHT, as the format
    requires — a decoder must read them, not assume Annex K) → MSB
    bit-packing with 0xFF byte stuffing. Pixel (x, y) is the shared
    ``(x*31 + y*17 + seed) % 256`` formula. Lossy only through
    coefficient rounding: the decode round-trip error is a few levels
    at most (pinned by tests), since the quantization table is all
    ones. FDCT + entropy coding run fully vectorized
    (:func:`_formula_planes_zigzag` / :func:`_jpeg_entropy_encode`);
    the byte stream is identical to the former per-symbol loop."""
    import numpy as np

    zz = _formula_planes_zigzag(width, height, seed, 1)
    sets, data = _jpeg_entropy_encode(zz, np.zeros(len(zz), np.int64), [0], 1)
    dc_bits, dc_vals, ac_bits, ac_vals = sets[0]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dht = seg(0xC4, b"\x00" + bytes(dc_bits[1:]) + bytes(dc_vals)) + seg(
        0xC4, b"\x10" + bytes(ac_bits[1:]) + bytes(ac_vals)
    )
    sos = seg(0xDA, b"\x01\x01\x00" + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + data + b"\xff\xd9"


def make_jpeg_color(width: int, height: int, seed: int = 0) -> bytes:
    """Build a REAL baseline COLOR JPEG (YCbCr 4:4:4 interleaved,
    fixture/test helper): three planes through the same FDCT → unit
    quantization → canonical-Huffman pipeline as :func:`make_jpeg`,
    with the standard two-table-set layout (luma tables th=0 for
    component 1, chroma tables th=1 shared by components 2 and 3) and
    MCU-interleaved entropy data. Channel *ch* pixel (x, y) is
    ``(x*31 + y*17 + seed + 85*ch) % 256`` — the shared formula with a
    per-channel offset, so one SQL oracle covers all three planes.
    FDCT + entropy coding run fully vectorized across all blocks of
    all three components (:func:`_formula_planes_zigzag` emits the
    MCU-interleaved zigzag rows, :func:`_jpeg_entropy_encode` the
    standard two-table-set stream — luma th=0 from component 1,
    chroma th=1 shared by 2 and 3); byte-identical to the former
    per-symbol loop."""
    import numpy as np

    zz = _formula_planes_zigzag(width, height, seed, 3)
    comp = np.tile(np.arange(3), len(zz) // 3)
    sets, data = _jpeg_entropy_encode(zz, comp, [0, 1, 1], 2)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes([1] * 64)) + seg(0xDB, b"\x01" + bytes([1] * 64))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x11\x00"  # Y: sampling 1x1, quant table 0
        + b"\x02\x11\x01"  # Cb: quant table 1
        + b"\x03\x11\x01",  # Cr: quant table 1
    )
    dht = b"".join(
        seg(0xC4, bytes([tc << 4 | th]) + bytes(bits[1:]) + bytes(vals))
        for th, (dc_bits_, dc_vals_, ac_bits_, ac_vals_) in enumerate(sets)
        for tc, (bits, vals) in ((0, (dc_bits_, dc_vals_)), (1, (ac_bits_, ac_vals_)))
    )
    sos = seg(0xDA, b"\x03" + b"\x01\x00" + b"\x02\x11" + b"\x03\x11" + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + data + b"\xff\xd9"


_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_ZIGZAG_ARR = _np.array(_ZIGZAG)
_INV_ZIGZAG_ARR = _np.argsort(_ZIGZAG_ARR)


def decode_jpeg_gray(payload: bytes | None):
    """REAL baseline JPEG pixel decode, grayscale arm: returns the
    (h, w) uint8 plane for 1-component baseline payloads, None for
    everything else (including color — use :func:`decode_jpeg_ycbcr`
    for 3-component). See :func:`_decode_jpeg_planes` for the actual
    codec."""
    planes = _decode_jpeg_planes(payload)
    if planes is None or planes.shape[2] != 1:
        return None
    return planes[:, :, 0]


def decode_jpeg_ycbcr(payload: bytes | None):
    """REAL baseline COLOR JPEG pixel decode (YCbCr 4:4:4,
    interleaved): returns the (h, w, 3) uint8 array in YCbCr domain —
    exactly what the entropy decode + dequant + IDCT recover, before
    any color-space conversion (apply :func:`ycbcr_to_rgb` for RGB).
    None for non-color/subsampled/corrupt payloads."""
    planes = _decode_jpeg_planes(payload)
    if planes is None or planes.shape[2] != 3:
        return None
    return planes


def ycbcr_to_rgb(ycbcr):
    """JFIF full-range BT.601 YCbCr -> RGB (uint8 in, uint8 out):
    R = Y + 1.402(Cr-128), G = Y - 0.344136(Cb-128) - 0.714136(Cr-128),
    B = Y + 1.772(Cb-128), rounded then clipped."""
    import numpy as np

    y = ycbcr[..., 0].astype(np.float64)
    cb = ycbcr[..., 1].astype(np.float64) - 128.0
    cr = ycbcr[..., 2].astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_jpeg_planes(payload: bytes | None):
    """REAL baseline JPEG pixel decode (1-component grayscale or
    3-component YCbCr 4:4:4 interleaved, no restart markers): segment
    walk → DQT/DHT canonical-Huffman table build → entropy decode (MSB
    bit reader with 0xFF00 unstuffing, per-component DC prediction, AC
    run-length/EOB/ZRL, MCU-interleaved components) → dequantize → 8×8
    IDCT → level shift → crop. Stdlib ``struct`` + numpy only. Returns
    (h, w, ncomp) uint8 or None for progressive/subsampled/corrupt
    payloads — the corrupt-blob contract."""
    import numpy as np

    if payload is None or payload[:2] != b"\xff\xd8":
        return None
    try:
        pos, n = 2, len(payload)
        qtables: dict[int, list[int]] = {}
        htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        width = height = None
        sof_comps: list[tuple[int, int]] = []  # (component id, tq) in SOF order
        scan_tables: list[tuple[int, int, int]] = []  # (cid, dc_id, ac_id) in scan order
        data_start = None
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD9:
                break
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            body = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0x0F
                    if pq != 0:
                        return None  # 16-bit tables unsupported
                    if len(body) < i + 65:
                        return None  # truncated table: not 64 entries
                    qtables[tq] = list(body[i + 1 : i + 65])
                    i += 65
            elif marker == 0xC4:
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0x0F
                    bits = list(body[i + 1 : i + 17])
                    nv = sum(bits)
                    vals = list(body[i + 17 : i + 17 + nv])
                    # canonical code assignment
                    table: dict[tuple[int, int], int] = {}
                    code = 0
                    k = 0
                    for length in range(1, 17):
                        for _ in range(bits[length - 1]):
                            table[(length, code)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    htables[(tc, th)] = table
                    i += 17 + nv
            elif marker == 0xC0:
                _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
                if ncomp not in (1, 3):
                    return None
                if width * height == 0 or width * height * ncomp > MAX_DECODE_PIXELS:
                    return None
                for ci in range(ncomp):
                    cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                    if sampling != 0x11:
                        return None  # subsampled (4:2:0/4:2:2) unsupported
                    sof_comps.append((cid, tq))
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types
            elif marker == 0xDA:
                ns = body[0]
                if ns != len(sof_comps):
                    return None  # multi-scan not supported
                for si in range(ns):
                    cs, tabs = body[1 + 2 * si], body[2 + 2 * si]
                    scan_tables.append((cs, tabs >> 4, tabs & 0x0F))
                data_start = pos + 2 + seglen
                break
            pos += 2 + seglen
        if data_start is None or width is None or not qtables or not scan_tables:
            return None
        # resolve per-scan-component tables; scan components reference
        # SOF components by id
        sof_by_id = dict(sof_comps)
        comps = []
        for cid, dc_id, ac_id in scan_tables:
            if cid not in sof_by_id:
                return None
            dc_table = htables.get((0, dc_id))
            ac_table = htables.get((1, ac_id))
            if dc_table is None or ac_table is None:
                return None
            tq = sof_by_id[cid]
            if tq not in qtables:
                return None
            comps.append((dc_table, ac_table, np.array(qtables[tq], dtype=np.float64)))

        # entropy data: unstuff 0xFF00, stop at next marker
        raw = bytearray()
        i = data_start
        while i < n:
            b = payload[i]
            if b == 0xFF:
                if i + 1 < n and payload[i + 1] == 0x00:
                    raw.append(0xFF)
                    i += 2
                    continue
                break  # a real marker (EOI) ends the scan
            raw.append(b)
            i += 1

        total_bits = len(raw) * 8
        # 3 padding bytes so the 24-bit window read below never indexes
        # past the buffer; bounds vs total_bits still gate consumption,
        # so padding bits can never be silently decoded
        raw_b = bytes(raw) + b"\x00\x00\x00"

        # 256-entry LUTs for codes of length <= 8: one O(1) lookup per
        # symbol instead of one dict probe per BIT. Longer codes (legal
        # baseline, just not what our encoder emits) fall back to the
        # bit-by-bit walk below.
        def build_lut(table):
            lut_sym, lut_len = [0] * 256, [0] * 256
            for (length, code), sym in table.items():
                if length <= 8:
                    base = code << (8 - length)
                    for j in range(base, base + (1 << (8 - length))):
                        lut_sym[j] = sym
                        lut_len[j] = length
            return lut_sym, lut_len

        lut_cache: dict[int, tuple[list[int], list[int]]] = {}

        def lut_of(table):
            got = lut_cache.get(id(table))
            if got is None:
                got = lut_cache[id(table)] = build_lut(table)
            return got

        comp_dec = [
            (lut_of(dc_table), dc_table, lut_of(ac_table), ac_table)
            for dc_table, ac_table, _q in comps
        ]

        def read_slow(code8: int, table, p: int):
            # codes of length 9..16: extend the failed 8-bit prefix one
            # bit at a time (prefix-free codes — at most one can match)
            code = code8
            for length in range(9, 17):
                if p + length > total_bits:
                    raise IndexError
                bp = p + length - 1
                code = (code << 1) | ((raw_b[bp >> 3] >> (7 - (bp & 7))) & 1)
                if (length, code) in table:
                    return table[(length, code)], length
            raise IndexError

        C = _dct_matrix()
        bh, bw = (height + 7) // 8 * 8, (width + 7) // 8 * 8
        nby, nbx = bh // 8, bw // 8
        n_mcus = nby * nbx
        ncomp = len(comps)
        coefs = np.zeros((n_mcus, ncomp, 64), dtype=np.float64)
        prev_dc = [0] * ncomp
        p = 0  # bit position
        for mi in range(n_mcus):
            for ci in range(ncomp):
                (dc_sym, dc_len), dc_table, (ac_sym, ac_len), ac_table = comp_dec[ci]
                row = coefs[mi, ci]
                k = 0  # 0 decodes the DC symbol, then ACs to 63
                while k < 64:
                    # one 24-bit window serves both the (<=8-bit fast
                    # path) Huffman code and its <=15-bit amplitude
                    byte, sh = p >> 3, p & 7
                    w24 = (
                        (raw_b[byte] << 16) | (raw_b[byte + 1] << 8) | raw_b[byte + 2]
                    )
                    pre = (w24 >> (16 - sh)) & 0xFF
                    if k == 0:
                        length = dc_len[pre]
                        if length:
                            sym = dc_sym[pre]
                        else:
                            sym, length = read_slow(pre, dc_table, p)
                        size = sym
                    else:
                        length = ac_len[pre]
                        if length:
                            sym = ac_sym[pre]
                        else:
                            sym, length = read_slow(pre, ac_table, p)
                        if sym == 0x00:  # EOB
                            if p + length > total_bits:
                                raise IndexError
                            p += length
                            break
                        if sym == 0xF0:  # ZRL
                            if p + length > total_bits:
                                raise IndexError
                            p += length
                            k += 16
                            continue
                        k += sym >> 4
                        if k > 63:
                            return None
                        size = sym & 0x0F
                    if p + length + size > total_bits:
                        raise IndexError
                    if size:
                        if length + size <= 24 - sh:
                            v = (w24 >> (24 - sh - length - size)) & ((1 << size) - 1)
                        else:  # slow-path code pushed past the window
                            ap = p + length
                            abyte, ash = ap >> 3, ap & 7
                            v = (
                                (
                                    (raw_b[abyte] << 24)
                                    | (raw_b[abyte + 1] << 16)
                                    | (raw_b[abyte + 2] << 8)
                                    | raw_b[abyte + 3]
                                )
                                >> (32 - ash - size)
                            ) & ((1 << size) - 1)
                        if v < (1 << (size - 1)):
                            v -= (1 << size) - 1
                    else:
                        v = 0
                    p += length + size
                    if k == 0:
                        prev_dc[ci] += v
                        row[0] = prev_dc[ci]
                        k = 1
                    else:
                        row[k] = v
                        k += 1

        # dequantize + IDCT, batched over every block of every
        # component in one shot (the per-block matmuls were ~40% of
        # decode time at fixture sizes)
        qarr = np.stack([q for _dc, _ac, q in comps])  # (ncomp, 64)
        coef = (coefs * qarr[None, :, :])[:, :, _INV_ZIGZAG_ARR].reshape(
            n_mcus, ncomp, 8, 8
        )
        spatial = C.T @ coef @ C + 128.0
        out = (
            spatial.reshape(nby, nbx, ncomp, 8, 8)
            .transpose(0, 3, 1, 4, 2)
            .reshape(bh, bw, ncomp)
        )
        return np.clip(np.rint(out[:height, :width]), 0, 255).astype(np.uint8)
    except (struct.error, IndexError, KeyError, ValueError):
        return None


def make_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Build a REAL GIF87a grayscale image (fixture/test helper):
    logical screen descriptor, 256-entry gray palette, image
    descriptor, and an LZW-compressed (spec-correct, with clear codes)
    pixel stream. Pixel (x, y) is the same ``(x*31 + y*17 + seed) %
    256`` formula as :func:`make_png`, so one SQL oracle covers both."""
    pixels = [
        (x * 31 + y * 17 + seed) % 256 for y in range(height) for x in range(width)
    ]
    # LZW encode, 8-bit min code size (codes start at 9 bits)
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out_bits: list[tuple[int, int]] = [(clear, min_code + 1)]
    table = {(c,): c for c in range(256)}
    next_code = eoi + 1
    code_size = min_code + 1
    buf: tuple[int, ...] = ()
    for p in pixels:
        cand = buf + (p,)
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], code_size))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:  # table full: emit clear, reset
            out_bits.append((clear, code_size))
            table = {(c,): c for c in range(256)}
            next_code = eoi + 1
            code_size = min_code + 1
        buf = (p,)
    if buf:
        out_bits.append((table[buf], code_size))
    out_bits.append((eoi, code_size))
    # pack LSB-first
    acc = n_acc = 0
    data = bytearray()
    for code, width_bits in out_bits:
        acc |= code << n_acc
        n_acc += width_bits
        while n_acc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        data.append(acc & 0xFF)
    # sub-blocks of <=255 bytes
    blocks = b"".join(
        bytes([len(data[i : i + 255])]) + bytes(data[i : i + 255])
        for i in range(0, len(data), 255)
    )
    palette = bytes(v for c in range(256) for v in (c, c, c))
    return (
        b"GIF87a"
        + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # global 256-color table
        + palette
        + b","
        + struct.pack("<HHHHB", 0, 0, width, height, 0)  # image descriptor
        + bytes([min_code])
        + blocks
        + b"\x00;"
    )


def decode_gif_gray(payload: bytes | None):
    """REAL GIF pixel decode: header + palette walk, then a full LZW
    decoder (variable code width, clear/EOI codes, table resets) over
    the sub-block stream; palette-mapped to grayscale via the red
    channel. Stdlib-only + numpy. Returns None for non-GIF,
    interlaced, local-palette-less corrupt, or truncated payloads —
    the corrupt-blob contract."""
    import numpy as np

    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        pos = 6
        width, height, flags, _bg, _ar = struct.unpack("<HHBBB", payload[pos : pos + 7])
        pos += 7
        palette = None
        if flags & 0x80:
            n_colors = 2 << (flags & 0x07)
            palette = payload[pos : pos + 3 * n_colors]
            pos += 3 * n_colors
        # skip extensions to the image descriptor
        while pos < len(payload) and payload[pos] == 0x21:
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        if pos >= len(payload) or payload[pos] != 0x2C:
            return None
        _l, _t, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
        pos += 10
        if iflags & 0x40:  # interlaced: out of scope
            return None
        if iflags & 0x80:
            n_colors = 2 << (iflags & 0x07)
            palette = payload[pos : pos + 3 * n_colors]
            pos += 3 * n_colors
        if palette is None:
            return None
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 8:  # spec range; beyond it the root
            return None  # table would need codes > 255
        if iw * ih == 0 or iw * ih > MAX_DECODE_PIXELS:
            return None
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            bl = payload[pos]
            data += payload[pos + 1 : pos + 1 + bl]
            pos += 1 + bl
        # LZW decode (LSB-first variable-width codes)
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        code_size = min_code + 1
        table: list[bytes] = [bytes([c]) for c in range(1 << min_code)] + [b"", b""]
        acc = n_acc = di = 0
        prev: bytes | None = None
        out = bytearray()
        while True:
            while n_acc < code_size:
                if di >= len(data):
                    return None  # ran out before EOI
                acc |= data[di] << n_acc
                di += 1
                n_acc += 8
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            n_acc -= code_size
            if code == clear:
                table = [bytes([c]) for c in range(1 << min_code)] + [b"", b""]
                code_size = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
        # the image DESCRIPTOR's dims govern the pixel stream layout —
        # the logical screen can legally differ (offsets/partial images)
        if len(out) < iw * ih:
            return None
        idx = np.frombuffer(bytes(out[: iw * ih]), dtype=np.uint8)
        gray = np.frombuffer(palette, dtype=np.uint8)[::3]  # red channel
        return gray[idx].reshape(ih, iw)
    except (struct.error, IndexError):
        return None


def resize_nearest(px, out_w: int, out_h: int):
    """Nearest-neighbor resize of a decoded (h, w[, c]) uint8 plane:
    output (y, x) samples source (floor(y*h/out_h), floor(x*w/out_w))
    — the standard NN index map, integer-exact (so a SQL oracle can
    replay thumbnails bit-for-bit, unlike bilinear). Works for both
    down- and up-sampling."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys[:, None], xs[None, :]]


# ---------------------------------------------------------------------------
# Native-codec seam. The FROZEN drop-in contract for a production
# decoder (libjpeg-turbo / PIL / ffmpeg wrapper):
#
#     decoder(payload: bytes) -> numpy.ndarray | None
#
# - ``payload`` is the raw binary column value (always ``bytes``,
#   never None — callers null-gate before the seam);
# - returns a 2-D uint8 array (grayscale/luma plane) on success,
#   ``None`` for undecodable/corrupt payloads (the corrupt-blob
#   contract: null row out, never an exception that kills the task);
# - the callable is pickled into Arrow ``mapInPandas`` workers, so it
#   must be importable/serializable (a top-level function or a small
#   class instance, not a lambda over open handles).
#
# ``tests/test_multimodal.py::test_native_decoder_seam_*`` pins this
# signature: a fixture decoder injected here must reproduce the default
# pipeline's gate output exactly, and a deliberately different decoder
# must visibly take effect (proof the seam is live, not decorative).
# ---------------------------------------------------------------------------


def default_gray_decoder(payload: bytes) -> "_np.ndarray | None":
    """The built-in pure-Python decode dispatch behind the seam:
    format-sniff (PNG IHDR / JPEG SOI / GIF header) then the matching
    stdlib+numpy decoder."""
    data = bytes(payload)
    fmt, _w, _h = parse_image_dims(data)
    if fmt == "png":
        return decode_png_gray(data)
    if fmt == "gif":
        return decode_gif_gray(data)
    if fmt == "jpeg":
        return decode_jpeg_gray(data)
    return None


def extract_thumbnails(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    thumb: int = 8,
    decoder=None,
) -> DataFrame:
    """REAL thumbnail pipeline: decode (PNG zlib+defilter / GIF LZW /
    baseline JPEG) → nearest-neighbor resize to ``thumb``×``thumb`` →
    emit the thumbnail bytes plus integer-exact stats. Corrupt or
    undecodable payloads yield null rows (corrupt-blob contract).
    Arrow-batched ``mapInPandas``; repartition inputs for decode
    parallelism as with the other media kernels.

    ``decoder``: optional drop-in native codec honoring the frozen
    :func:`default_gray_decoder` seam signature; None = the built-in
    pure-Python dispatch."""
    import numpy as np

    decode = decoder or default_gray_decoder

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("thumb", T.BinaryType(), True),  # thumb*thumb bytes, row-major
            T.StructField("pix_sum", T.LongType(), True),
            T.StructField("first_px", T.IntegerType(), True),
            T.StructField("last_px", T.IntegerType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode(bytes(payload)) if payload is not None else None
                if px is None:
                    rows.append((did, None, None, None, None))
                    continue
                t = resize_nearest(np.asarray(px), thumb, thumb)
                flat = t.reshape(-1)
                rows.append(
                    (
                        did,
                        bytes(flat.tolist()),
                        int(flat.astype(np.int64).sum()),
                        int(flat[0]),
                        int(flat[-1]),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "thumb", "pix_sum", "first_px", "last_px"]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def extract_image_pixel_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decoder=None,
) -> DataFrame:
    """Batch-wise REAL pixel statistics over a binary column: each
    payload is pixel-decoded — PNG via :func:`decode_png_gray` (zlib
    inflate + full defilter), GIF via :func:`decode_gif_gray` (full
    LZW) — and reduced to integer-exact stats: (id, n_px, mean_px,
    min_px, max_px, b0..b3 quartile-histogram counts). The mean is an
    integer sum with ONE double division, so a SQL oracle matches
    bit-for-bit. Non-decodable payloads yield null rows.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_px", T.LongType(), True),
            T.StructField("mean_px", T.DoubleType(), True),
            T.StructField("min_px", T.IntegerType(), True),
            T.StructField("max_px", T.IntegerType(), True),
            T.StructField("b0", T.LongType(), True),
            T.StructField("b1", T.LongType(), True),
            T.StructField("b2", T.LongType(), True),
            T.StructField("b3", T.LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "n_px", "mean_px", "min_px", "max_px", "b0", "b1", "b2", "b3"]
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if decoder is not None:
                    px = decoder(bytes(payload)) if payload is not None else None
                else:
                    # built-in path: try-each-format (slightly laxer than
                    # the sniffing default_gray_decoder on malformed
                    # headers; kept verbatim so gate output is stable)
                    px = decode_png_gray(payload)
                    if px is None:
                        px = decode_gif_gray(payload)
                    if px is None:
                        px = decode_jpeg_gray(payload)
                if px is None or px.size == 0:
                    rows.append((mid, None, None, None, None, None, None, None, None))
                    continue
                flat = px.astype(np.int64).ravel()
                hist = [int(((flat >= lo) & (flat < lo + 64)).sum()) for lo in (0, 64, 128, 192)]
                rows.append(
                    (
                        mid,
                        int(flat.size),
                        int(flat.sum()) / float(flat.size),
                        int(flat.min()),
                        int(flat.max()),
                        *hist,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def make_mp4(
    duration_ms: int, timescale: int = 1000, n_tracks: int = 1, width: int = 0, height: int = 0
) -> bytes:
    """Build a structurally valid ISO-BMFF (MP4) metadata stream:
    ftyp + moov(mvhd + n_tracks × trak(tkhd)) with real box sizes,
    version-0 mvhd carrying the true timescale/duration, and tkhd
    carrying 16.16 fixed-point width/height. Media samples (mdat) are
    omitted — the box walk a metadata parser must do is all real."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    duration = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH2x8x", 0x00010000, 0x0100)  # rate, volume, reserved
        + b"\x00" * 36  # matrix (zero-filled fixture)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", n_tracks + 1),  # next_track_ID
    )
    traks = b"".join(
        box(
            b"trak",
            box(
                b"tkhd",
                struct.pack(">B3x", 0)
                + struct.pack(">IIII", 0, 0, tid + 1, 0)
                + struct.pack(">I", duration)
                + b"\x00" * 8  # reserved
                + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, group, volume, rsvd
                + b"\x00" * 36  # matrix
                + struct.pack(">II", width << 16, height << 16),
            ),
        )
        for tid in range(n_tracks)
    )
    return ftyp + box(b"moov", mvhd + traks)


def parse_mp4(
    payload: bytes | None,
) -> tuple[int | None, int | None, int | None]:
    """Parse ``(duration_ms, timescale, n_tracks)`` from real MP4
    bytes: walk the top-level box chain to moov, then moov's children
    for mvhd (version 0 or 1) and trak boxes. Stdlib ``struct`` only.

    Non-MP4, truncated, or mvhd-less payloads return all Nones instead
    of raising (same corrupt-blob contract as the image/audio parsers).
    """
    if payload is None or len(payload) < 12:
        return (None, None, None)

    def walk(buf: bytes):
        pos, n = 0, len(buf)
        while pos + 8 <= n:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            typ = buf[pos + 4 : pos + 8]
            body_off = pos + 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > n:
                    return
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                body_off = pos + 16
            if size < 8 or pos + size > n:
                return
            yield typ, buf[body_off : pos + size]
            pos += size

    top = {typ: body for typ, body in walk(payload)}
    if b"ftyp" not in top and b"moov" not in top:
        return (None, None, None)
    moov = top.get(b"moov")
    if moov is None:
        return (None, None, None)
    duration_ms = timescale = None
    n_tracks = 0
    for typ, body in walk(moov):
        if typ == b"mvhd" and len(body) >= 4:
            version = body[0]
            if version == 0 and len(body) >= 20:
                timescale, duration = struct.unpack(">II", body[12:20])
            elif version == 1 and len(body) >= 32:
                (timescale,) = struct.unpack(">I", body[20:24])
                (duration,) = struct.unpack(">Q", body[24:32])
            else:
                continue
            if timescale:
                duration_ms = duration * 1000 // timescale
        elif typ == b"trak":
            n_tracks += 1
    if timescale is None:
        return (None, None, None)
    return (duration_ms, timescale, n_tracks)


def extract_video_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Batch-wise REAL MP4 metadata decode over a binary column:
    (id, duration_ms, timescale, n_tracks) via :func:`parse_mp4`;
    corrupt payloads become null rows, not task failures."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("timescale", T.IntegerType(), True),
            T.StructField("n_tracks", T.IntegerType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                d, ts, nt = parse_mp4(payload)
                rows.append((mid, d, ts, nt))
            yield pd.DataFrame(rows, columns=[id_col, "duration_ms", "timescale", "n_tracks"])

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


AUDIO_SAMPLE_RATE = 16_000  # Hz, default rate for generated fixtures


def make_wav(n_samples: int, sample_rate: int = AUDIO_SAMPLE_RATE, seed: int = 0) -> bytes:
    """Build a REAL, fully valid mono 16-bit PCM WAV file
    (fixture/test helper): RIFF header, fmt chunk, data chunk — playable
    by any WAV reader. Sample *i* is ``((seed*31 + i*17) % 65536) -
    32768``, a formula a SQL oracle replays exactly."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    samples = ((seed * 31 + i * 17) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * 2  # mono, 16-bit
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


#: WAV format tags this module can decode: linear PCM and G.711 µ-law.
WAV_FMT_PCM = 1
WAV_FMT_MULAW = 7


def make_wav_ulaw(n_samples: int, sample_rate: int = AUDIO_SAMPLE_RATE, seed: int = 0) -> bytes:
    """Build a REAL G.711 µ-law WAV (fmt tag 7, 8 bits/sample, mono):
    the data bytes are µ-law CODES ``(seed*31 + i*17) % 256`` — a
    formula a SQL oracle replays through the same expansion
    arithmetic as :func:`mulaw_expand`."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    codes = ((seed * 31 + i * 17) % 256).astype(np.uint8)
    data = codes.tobytes()
    fmt = struct.pack("<HHIIHH", WAV_FMT_MULAW, 1, sample_rate, sample_rate, 1, 8)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav(
    payload: bytes | None,
) -> tuple[int | None, int | None, int | None, bytes | None]:
    """Parse ``(sample_rate, channels, bits, pcm_bytes)`` from real WAV
    bytes — stdlib-only RIFF chunk walk, no soundfile/librosa.
    (Four-tuple kept for compatibility; :func:`parse_wav_fmt` also
    returns the format tag, needed to tell µ-law from 8-bit PCM.)

    Non-WAV, truncated, or compressed (non-PCM/µ-law) payloads return
    all Nones instead of raising — at 100 TB a corrupt blob must not
    kill the task (same contract as :func:`parse_image_dims`)."""
    return parse_wav_fmt(payload)[:4]


def parse_wav_fmt(
    payload: bytes | None,
) -> tuple[int | None, int | None, int | None, bytes | None, int | None]:
    """:func:`parse_wav` plus the WAV format tag as a fifth element:
    ``(rate, channels, bits, data, audio_fmt)``."""
    bad = (None, None, None, None, None)
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return bad
    pos, n = 12, len(payload)
    rate = channels = bits = audio_fmt = None
    data: bytes | None = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels, rate, _br, _align, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt not in (WAV_FMT_PCM, WAV_FMT_MULAW):
                return bad  # other codecs are out of scope
            if rate == 0 or channels == 0:  # corrupt header, not a rate
                return bad
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        return bad
    return (rate, channels, bits, data, audio_fmt)


def mulaw_expand(codes):
    """G.711 µ-law byte → linear 16-bit expansion (ITU-T G.711 table
    semantics, computed): complement, split sign/exponent/mantissa,
    ``((mantissa << 3) + 0x84) << exponent) - 0x84``, apply sign.
    Vectorized over a numpy uint8 array; exactly replayable in SQL
    with integer shifts."""
    import numpy as np

    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int64) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(sign != 0, -magnitude, magnitude)


def extract_audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Per-clip audio features via Arrow-batched mapInPandas — REAL
    decode for PCM and G.711 µ-law WAV payloads, stdlib + numpy only.

    Output: (id, sample_rate, duration_ms, amp_mean, amp_peak).
    Duration comes from the actual fmt/data chunks; amplitude stats
    from the actual linear samples (int16 PCM directly, µ-law bytes
    through :func:`mulaw_expand`), normalized to [0, 1]:
    ``amp_mean = sum(|s|) / (n * 32768)`` (integer sum, so the single
    double division is oracle-exact), ``amp_peak = max(|s|) / 32768``.
    Unknown/corrupt/compressed payloads yield null stats, not task
    failures. (mp3/ogg would need a codec not in this container and
    fall into the null path.)
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("amp_mean", T.DoubleType(), True),
            T.StructField("amp_peak", T.DoubleType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, channels, bits, data, fmt = parse_wav_fmt(payload)
                if fmt == WAV_FMT_PCM and bits == 16 and data:
                    samples = np.frombuffer(
                        data[: len(data) - (len(data) % 2)], dtype="<i2"
                    ).astype(np.int64)
                elif fmt == WAV_FMT_MULAW and bits == 8 and data:
                    samples = mulaw_expand(np.frombuffer(data, dtype=np.uint8))
                else:
                    rows.append((mid, None, None, None, None))
                    continue
                n_frames = len(samples) // max(channels or 1, 1)
                if len(samples) == 0:
                    rows.append((mid, rate, 0, None, None))
                    continue
                sum_abs = int(np.abs(samples).sum())
                max_abs = int(np.abs(samples).max())
                rows.append(
                    (
                        mid,
                        rate,
                        n_frames * 1000 // rate,
                        sum_abs / (len(samples) * 32768.0),
                        max_abs / 32768.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_rate", "duration_ms", "amp_mean", "amp_peak"]
            )

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------------
# REAL video frame extraction: YUV4MPEG2 (.y4m) — the standard
# uncompressed interchange format (ffmpeg/x264 reference input).
# Unlike the compressed-codec stub above, every byte here is decoded
# for real: the header grammar is plain ASCII tokens and each frame is
# raw planar YUV, so stdlib parsing yields actual pixels.
# ---------------------------------------------------------------------------

#: Chroma subsampling -> bytes per frame given (w, h) luma dims.
_Y4M_CHROMA_FRAME_BYTES = {
    "420": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
    "422": lambda w, h: w * h + 2 * ((w // 2) * h),
    "444": lambda w, h: 3 * w * h,
    "mono": lambda w, h: w * h,
}


def _y4m_chroma_key(tag: str) -> str | None:
    if tag == "mono":
        return "mono"
    for k in ("420", "422", "444"):
        if tag.startswith(k):
            return k
    return None


def parse_y4m_header(
    payload: bytes | None,
) -> tuple[int, int, int, int, str, int] | None:
    """Parse a REAL YUV4MPEG2 stream header: returns
    ``(width, height, fps_num, fps_den, chroma, data_offset)`` or None
    for anything malformed (corrupt-blob contract — never raises).

    Grammar (y4m spec): one ASCII line ``YUV4MPEG2 W<w> H<h> F<n>:<d>
    [Ip] [A<x>:<y>] [C<chroma>]\\n`` followed by frames. Missing C
    defaults to 420jpeg per the spec.
    """
    if payload is None or len(payload) < 10 or not payload.startswith(b"YUV4MPEG2"):
        return None
    nl = payload.find(b"\n", 0, 512)
    if nl < 0:
        return None
    w = h = num = den = None
    chroma = "420"
    try:
        for tok in payload[9:nl].decode("ascii").split():
            if tok[:1] == "W":
                w = int(tok[1:])
            elif tok[:1] == "H":
                h = int(tok[1:])
            elif tok[:1] == "F":
                num, den = (int(x) for x in tok[1:].split(":"))
            elif tok[:1] == "C":
                chroma = _y4m_chroma_key(tok[1:])  # type: ignore[assignment]
    except (ValueError, UnicodeDecodeError):
        return None
    if (
        w is None
        or h is None
        or num is None
        or den is None
        or w <= 0
        or h <= 0
        or num <= 0
        or den <= 0
        or chroma is None
    ):
        return None
    if w * h > MAX_DECODE_PIXELS:  # decompression-bomb guard, same as images
        return None
    return (w, h, num, den, chroma, nl + 1)


def iter_y4m_frames(payload: bytes | None):
    """Yield ``(frame_idx, frame_ts_ms, y_plane_bytes)`` from a real
    y4m stream — actual decoded luma, not a digest. Stops at the first
    malformed frame header or truncated frame (salvages the valid
    prefix, the standard recovery for interrupted captures); a payload
    with a bad STREAM header yields nothing.
    """
    hdr = parse_y4m_header(payload)
    if hdr is None:
        return
    w, h, num, den, chroma, pos = hdr
    frame_bytes = _Y4M_CHROMA_FRAME_BYTES[chroma](w, h)
    luma = w * h
    idx = 0
    assert payload is not None
    n = len(payload)
    while pos < n:
        nl = payload.find(b"\n", pos, pos + 256)
        if nl < 0 or payload[pos : pos + 5] != b"FRAME":
            return
        data_start = nl + 1
        if data_start + frame_bytes > n:
            return
        yield (idx, idx * 1000 * den // num, payload[data_start : data_start + luma])
        pos = data_start + frame_bytes
        idx += 1


def make_y4m(
    width: int,
    height: int,
    n_frames: int,
    fps: tuple[int, int] = (25, 1),
    seed: int = 0,
    chroma: str = "420jpeg",
) -> bytes:
    """Build a REAL, fully valid YUV4MPEG2 stream (fixture/test
    helper) any y4m consumer (ffmpeg, mplayer) accepts. Frame *i*'s
    luma plane is two-level — first half ``c_i``, second half
    ``c_i + 1`` with ``c_i = (seed*31 + i*7) % 255`` — so its exact
    integer sum is ``c_i*n + (n - n//2)``: a SQL oracle replays it,
    and any plane-offset bug in a decoder shifts the sum. Chroma
    planes use distinct constants (``c_i+83``, ``c_i+167`` mod 256) so
    reads that stray into U/V are detected too.
    """
    key = _y4m_chroma_key(chroma.lstrip("C"))
    if key is None:
        raise ValueError(f"unsupported chroma {chroma!r}")
    header = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
    out = [header.encode("ascii")]
    n = width * height
    cb = _Y4M_CHROMA_FRAME_BYTES[key](width, height) - n
    for i in range(n_frames):
        c = (seed * 31 + i * 7) % 255
        y = bytes([c]) * (n // 2) + bytes([c + 1]) * (n - n // 2)
        u_v = (
            bytes([(c + 83) % 256]) * (cb // 2) + bytes([(c + 167) % 256]) * (cb - cb // 2)
            if cb
            else b""
        )
        out.append(b"FRAME\n" + y + u_v)
    return b"".join(out)


def sample_y4m_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """REAL frame sampling over a y4m binary column: decode actual
    luma planes batch-wise (Arrow in, Arrow out — bytes never leave
    the executor), keep one frame per ``every_ms`` of presentation
    time, and emit integer-exact luma statistics per kept frame:
    ``(id, frame_idx, frame_ts_ms, width, height, luma_sum,
    n_pixels)``. Corrupt / non-y4m payloads contribute zero rows
    (frame-level explode contract — same shape as
    :func:`sample_video_frames`, with the decode real instead of
    stubbed).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("luma_sum", T.LongType(), False),
            T.StructField("n_pixels", T.LongType(), False),
        ]
    )
    cols = [id_col, "frame_idx", "frame_ts_ms", "width", "height", "luma_sum", "n_pixels"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                hdr = parse_y4m_header(payload)
                if hdr is None:
                    continue
                w, h = hdr[0], hdr[1]
                kept, next_ts = 0, 0
                for idx, ts_ms, y in iter_y4m_frames(payload):
                    if ts_ms < next_ts:
                        continue
                    luma_sum = int(np.frombuffer(y, dtype=np.uint8).sum(dtype=np.int64))
                    rows.append((mid, idx, ts_ms, w, h, luma_sum, len(y)))
                    kept += 1
                    next_ts = ts_ms + every_ms
                    if kept >= max_frames:
                        break
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)
