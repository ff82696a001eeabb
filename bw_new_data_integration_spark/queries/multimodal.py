"""multimodal query-family module — split from the monolithic queries.py
(round 6). Registration side effects only; the public registry surface
lives in the package __init__."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bw_new_data_integration_spark import catalog
from bw_new_data_integration_spark.functions import coercion, keys, text, vectors
from bw_new_data_integration_spark.operators import (
    aggregate,
    dedup,
    merge,
    similarity,
    window_ops,
)
from bw_new_data_integration_spark.session import tune_for_oracle_parity  # noqa: F401
from bw_new_data_integration_spark.queries._shared import (  # noqa: F401
    _REGISTRY,
    _ORACLES,
    register,
    registry,
    oracles,
    _t,
    _fanout,
    _collect_capped,
    _SHINGLE_SQL,
    _minhash_select_sql,
    _lsh_oracle,
    _BOILER_TEXT,
    _capped_lsh_oracle,
    _simhash_oracle,
    _dot_sql,
    _COS_SQL,
    _STOPWORD_LIST_SQL,
    _lang_id_oracle,
    _PIPELINES_YAML,
    _pipeline,
    _lsh_topk_oracle,
    _lsh_multiprobe_oracle,
    _xmla_cube_fixture,
    _IVF_COS_CENT,
    _near_dup_lsh_oracle,
    _TOKS_SQL,
    _cluster_oracle,
    _dedup_e2e_oracle,
    _profile_cols,

)



# ---------------------------------------------------------------------------
# Multimodal REAL header decode: the query builds actual image payloads
# on-executor (fully valid PNGs via make_png — zlib IDAT + CRCs; real
# JPEG marker streams via make_jpeg_header; and deliberately corrupt
# text bytes), then extract_image_meta parses format/width/height back
# out of the raw bytes with the stdlib struct walker
# (operators/multimodal.py parse_image_dims). The oracle replays the
# fixture formulas — a hash match proves the kernel recovered the TRUE
# dimensions from the bytes, and that corrupt payloads yield nulls
# instead of task failures.
# ---------------------------------------------------------------------------
@register(
    "mm_image_features",
    oracle="""
SELECT doc_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' END AS format,
       CAST(CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN (doc_id % 29) + 1
            WHEN 1 THEN (doc_id % 40) + 16 END AS INT) AS width,
       CAST(CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN (doc_id % 13) + 1
            WHEN 1 THEN (doc_id % 25) + 16 END AS INT) AS height
FROM documents
""",
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image header decode (PNG/GIF/JPEG dims, mode, bit depth) as typed metadata columns."""
    from bw_new_data_integration_spark.operators import multimodal

    docs = _fanout(spark, _t(spark, sf_dir, "documents").select("doc_id", "text"))

    import pandas as pd

    def gen(it):
        for pdf in it:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                kind = did % 3
                if kind == 0:
                    payloads.append(
                        multimodal.make_png(int(did % 29) + 1, int(did % 13) + 1, seed=int(did))
                    )
                elif kind == 1:
                    payloads.append(
                        multimodal.make_jpeg_header(int(did % 40) + 16, int(did % 25) + 16)
                    )
                else:  # corrupt payload: not an image at all
                    payloads.append((text or "x").encode("utf-8"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(
        gen, "doc_id bigint, payload binary"
    )
    return multimodal.extract_image_meta(media, payload_col="payload", id_col="doc_id")


# ---------------------------------------------------------------------------
# Multimodal REAL pixel decode: full PNG pipeline (zlib inflate +
# all-five-filters defilter, decode_png_gray) AND full GIF pipeline
# (variable-width LZW with clear/EOI and table resets,
# decode_gif_gray) on-executor, reduced to integer-exact stats. PNG
# fixtures cycle through every scanline filter; GIF fixtures share the
# same pixel FORMULA, so one oracle replays both: a hash match proves
# the PNG filter inversions AND the LZW decode. JPEG-header (no
# entropy decoder in-container) and corrupt payloads yield null rows.
# ---------------------------------------------------------------------------
@register(
    "mm_image_pixel_stats",
    oracle="""
WITH dims AS (
  SELECT doc_id, CAST((doc_id % 29) + 1 AS BIGINT) AS w, CAST((doc_id % 13) + 1 AS BIGINT) AS h
  FROM documents WHERE doc_id % 4 IN (0, 1)
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (tx.x * 31 + ty.y * 17 + d.doc_id) % 256 AS p
  FROM dims d, range(0, 29) tx(x), range(0, 13) ty(y)
  WHERE tx.x < d.w AND ty.y < d.h
),
stats AS (
  SELECT doc_id, COUNT(*) AS n_px,
         CAST(SUM(p) AS DOUBLE) / COUNT(*) AS mean_px,
         CAST(MIN(p) AS INT) AS min_px, CAST(MAX(p) AS INT) AS max_px,
         SUM(CASE WHEN p < 64 THEN 1 ELSE 0 END) AS b0,
         SUM(CASE WHEN p >= 64 AND p < 128 THEN 1 ELSE 0 END) AS b1,
         SUM(CASE WHEN p >= 128 AND p < 192 THEN 1 ELSE 0 END) AS b2,
         SUM(CASE WHEN p >= 192 THEN 1 ELSE 0 END) AS b3
  FROM px GROUP BY doc_id
)
SELECT doc_id, n_px, mean_px, min_px, max_px, b0, b1, b2, b3 FROM stats
UNION ALL
SELECT doc_id, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS INT), CAST(NULL AS INT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM documents WHERE doc_id % 4 IN (2, 3)
""",
)
def mm_image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full PNG/GIF pixel decode (inflate+defilter / LZW) with per-image pixel statistics."""
    from bw_new_data_integration_spark.operators import multimodal

    docs = _fanout(spark, _t(spark, sf_dir, "documents").select("doc_id", "text"))

    import pandas as pd

    def gen(it):
        for pdf in it:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                kind = did % 4
                w, h = int(did % 29) + 1, int(did % 13) + 1
                if kind == 0:
                    # filter type cycles through all five PNG filters;
                    # the decoded pixels must be identical regardless
                    payloads.append(
                        multimodal.make_png(w, h, seed=int(did), filter_type=int(did // 4) % 5)
                    )
                elif kind == 1:  # real GIF, same pixel formula: LZW path
                    payloads.append(multimodal.make_gif(w, h, seed=int(did)))
                elif kind == 2:  # header-only JPEG: no pixel data
                    payloads.append(
                        multimodal.make_jpeg_header(int(did % 40) + 16, int(did % 25) + 16)
                    )
                else:  # corrupt
                    payloads.append((text or "x").encode("utf-8"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id bigint, payload binary")
    return multimodal.extract_image_pixel_stats(media, payload_col="payload", id_col="doc_id")


# ---------------------------------------------------------------------------
# Baseline JPEG codec round-trip gate: make_jpeg encodes REAL entropy
# streams (FDCT -> unit quantization -> generated canonical Huffman in
# DHT -> bit-packing with 0xFF stuffing); decode_jpeg_gray decodes
# them. JPEG is lossy through coefficient rounding, so the gate pins
# exact dimensions + an error BOUND vs the pixel formula (max 2
# levels), the same discipline as the sketch gates — the oracle states
# the contract, Spark proves the decode satisfies it.
# ---------------------------------------------------------------------------
@register(
    "mm_jpeg_roundtrip",
    oracle="""
SELECT doc_id,
       CAST((doc_id % 29) + 1 AS INT) AS w_px,
       CAST((doc_id % 13) + 1 AS INT) AS h_px,
       CAST(((doc_id % 29) + 1) * ((doc_id % 13) + 1) AS BIGINT) AS n_px,
       TRUE AS within_tolerance
FROM documents
""",
)
def mm_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG grayscale decode (Huffman+IDCT) with pixel-stat verification."""
    from bw_new_data_integration_spark.operators import multimodal

    docs = _fanout(spark, _t(spark, sf_dir, "documents").select("doc_id"))

    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                w, h = int(did % 29) + 1, int(did % 13) + 1
                px = multimodal.decode_jpeg_gray(multimodal.make_jpeg(w, h, seed=int(did)))
                if px is None:
                    rows.append((did, None, None, None, False))
                    continue
                expect = np.fromfunction(
                    lambda y, x: (x * 31 + y * 17 + int(did)) % 256, (h, w), dtype=np.int64
                )
                err = int(np.abs(px.astype(np.int64) - expect).max())
                rows.append((did, px.shape[1], px.shape[0], px.size, err <= 2))
            yield pd.DataFrame(
                rows, columns=["doc_id", "w_px", "h_px", "n_px", "within_tolerance"]
            )

    return docs.mapInPandas(
        gen, "doc_id bigint, w_px int, h_px int, n_px bigint, within_tolerance boolean"
    )


# ---------------------------------------------------------------------------
# Baseline COLOR JPEG codec round-trip gate: make_jpeg_color encodes
# real YCbCr 4:4:4 MCU-interleaved entropy streams with the standard
# two-table-set layout (luma th=0, chroma th=1); decode_jpeg_ycbcr
# decodes all three planes with per-component DC prediction. Same
# error-bound discipline as the grayscale gate (<=2 levels per channel
# vs the per-channel pixel formula); exact dimensions pinned.
# ---------------------------------------------------------------------------
@register(
    "mm_jpeg_color_roundtrip",
    oracle="""
SELECT doc_id,
       CAST((doc_id % 29) + 1 AS INT) AS w_px,
       CAST((doc_id % 13) + 1 AS INT) AS h_px,
       CAST(((doc_id % 29) + 1) * ((doc_id % 13) + 1) * 3 AS BIGINT) AS n_vals,
       TRUE AS within_tolerance
FROM documents
""",
)
def mm_jpeg_color_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG YCbCr 4:4:4 color decode via 256-entry Huffman LUT, vectorized."""
    from bw_new_data_integration_spark.operators import multimodal

    docs = _fanout(spark, _t(spark, sf_dir, "documents").select("doc_id"))

    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for did in pdf["doc_id"]:
                w, h = int(did % 29) + 1, int(did % 13) + 1
                px = multimodal.decode_jpeg_ycbcr(
                    multimodal.make_jpeg_color(w, h, seed=int(did))
                )
                if px is None:
                    rows.append((did, None, None, None, False))
                    continue
                err = 0
                for ch in range(3):
                    expect = np.fromfunction(
                        lambda y, x: (x * 31 + y * 17 + int(did) + 85 * ch) % 256,
                        (h, w),
                        dtype=np.int64,
                    )
                    err = max(
                        err, int(np.abs(px[:, :, ch].astype(np.int64) - expect).max())
                    )
                rows.append((did, px.shape[1], px.shape[0], px.size, err <= 2))
            yield pd.DataFrame(
                rows, columns=["doc_id", "w_px", "h_px", "n_vals", "within_tolerance"]
            )

    return docs.mapInPandas(
        gen, "doc_id bigint, w_px int, h_px int, n_vals bigint, within_tolerance boolean"
    )


# ---------------------------------------------------------------------------
# Multimodal audio REAL decode: the query builds actual playable PCM
# WAV files on-executor (make_wav — real RIFF/fmt/data chunks, int16
# samples from a replayable formula) plus deliberately corrupt text
# payloads, then extract_audio_features parses the RIFF chunks and
# computes amplitude stats from the ACTUAL samples
# (operators/multimodal.py parse_wav + np.frombuffer). The oracle
# replays the sample formula — a hash match proves the kernel decoded
# the true rate/duration/amplitudes from the bytes, and that corrupt
# payloads yield nulls instead of task failures.
# ---------------------------------------------------------------------------
@register(
    "mm_audio_features",
    oracle="""
WITH params AS (
  SELECT doc_id, (doc_id % 977) + 100 AS n, CAST(doc_id % 4 AS INT) AS kind
  FROM documents WHERE doc_id % 4 <> 3
),
pcm AS (
  SELECT p.doc_id, p.n,
         SUM(abs(((p.doc_id * 31 + t.i * 17) % 65536) - 32768)) AS sum_abs,
         MAX(abs(((p.doc_id * 31 + t.i * 17) % 65536) - 32768)) AS max_abs
  FROM params p, range(0, 1077) t(i)
  WHERE t.i < p.n AND p.kind <> 1
  GROUP BY p.doc_id, p.n
),
ulaw AS (
  -- G.711 expansion of code c: u = 255-c; mag = (u%16*8+132)*2^((u//16)%8)-132
  SELECT p.doc_id, p.n,
         SUM(((255 - ((p.doc_id * 31 + t.i * 17) % 256)) % 16 * 8 + 132)
             * CAST(power(2, ((255 - ((p.doc_id * 31 + t.i * 17) % 256)) // 16) % 8) AS BIGINT)
             - 132) AS sum_abs,
         MAX(((255 - ((p.doc_id * 31 + t.i * 17) % 256)) % 16 * 8 + 132)
             * CAST(power(2, ((255 - ((p.doc_id * 31 + t.i * 17) % 256)) // 16) % 8) AS BIGINT)
             - 132) AS max_abs
  FROM params p, range(0, 1077) t(i)
  WHERE t.i < p.n AND p.kind = 1
  GROUP BY p.doc_id, p.n
),
stats AS (SELECT * FROM pcm UNION ALL SELECT * FROM ulaw)
SELECT doc_id, CAST(16000 AS INT) AS sample_rate,
       CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
       CAST(sum_abs AS DOUBLE) / (n * 32768.0) AS amp_mean,
       CAST(max_abs AS DOUBLE) / 32768.0 AS amp_peak
FROM stats
UNION ALL
SELECT doc_id, CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM documents WHERE doc_id % 4 = 3
""",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV/G.711 audio decode: sample rate, duration, PCM amplitude statistics."""
    from bw_new_data_integration_spark.operators import multimodal

    docs = _fanout(spark, _t(spark, sf_dir, "documents").select("doc_id", "text"))

    import pandas as pd

    def gen(it):
        for pdf in it:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                n = int(did % 977) + 100
                if did % 4 == 3:  # corrupt: not audio at all
                    payloads.append((text or "x").encode("utf-8"))
                elif did % 4 == 1:  # G.711 µ-law arm
                    payloads.append(multimodal.make_wav_ulaw(n, seed=int(did)))
                else:  # linear 16-bit PCM arm
                    payloads.append(multimodal.make_wav(n, seed=int(did)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id bigint, payload binary")
    return multimodal.extract_audio_features(media, payload_col="payload", id_col="doc_id")


# ---------------------------------------------------------------------------
# Multimodal video REAL metadata decode: actual ISO-BMFF (MP4) byte
# streams built on-executor (make_mp4 — real box sizes, version-0 mvhd,
# per-track tkhd) plus corrupt payloads; extract_video_meta walks the
# real box chain (operators/multimodal.py parse_mp4) to recover
# duration/timescale/track count. The oracle replays the fixture
# formulas including the ms -> timescale-units -> ms floor round-trip.
# Frame/pixel extraction stays a documented stub (no codec in this
# container); container metadata is now real for image, audio, video.
# ---------------------------------------------------------------------------
@register(
    "mm_video_meta",
    oracle="""
WITH p AS (
  SELECT doc_id,
         (doc_id % 9000) + 500 AS ms,
         CASE WHEN doc_id % 2 = 0 THEN 1000 ELSE 600 END AS ts,
         CAST((doc_id % 3) + 1 AS INT) AS n_tracks
  FROM documents WHERE doc_id % 5 <> 4
)
SELECT doc_id,
       CAST((ms * ts // 1000) * 1000 // ts AS BIGINT) AS duration_ms,
       CAST(ts AS INT) AS timescale,
       n_tracks
FROM p
UNION ALL
SELECT doc_id, CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT)
FROM documents WHERE doc_id % 5 = 4
""",
)
def mm_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/Y4M container metadata extraction (codec, dims, duration) without full decode."""
    from bw_new_data_integration_spark.operators import multimodal

    docs = _fanout(spark, _t(spark, sf_dir, "documents").select("doc_id", "text"))

    import pandas as pd

    def gen(it):
        for pdf in it:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if did % 5 == 4:  # corrupt: not a video container
                    payloads.append((text or "x").encode("utf-8"))
                else:
                    payloads.append(
                        multimodal.make_mp4(
                            int(did % 9000) + 500,
                            timescale=1000 if did % 2 == 0 else 600,
                            n_tracks=int(did % 3) + 1,
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id bigint, payload binary")
    return multimodal.extract_video_meta(media, payload_col="payload", id_col="doc_id")


# ---------------------------------------------------------------------------
# Multimodal video REAL frame extraction: actual YUV4MPEG2 streams
# (the standard uncompressed interchange format — ffmpeg's reference
# input) built on-executor by make_y4m, decoded frame-by-frame by
# sample_y4m_frames (operators/multimodal.py iter_y4m_frames walks the
# real header grammar and raw YUV planes). every_ms=80 over 25fps
# keeps frames 0 and 2 — presentation-time sampling, not index
# striding. The luma planes are two-level so the oracle's integer
# formula (c*n + n/2) only matches if the decoder finds the exact
# plane offsets; corrupt payloads contribute zero rows (frame-level
# explode contract). Compressed video codecs remain the documented
# stub; frame extraction itself is now REAL.
# ---------------------------------------------------------------------------
@register(
    "mm_video_frames",
    oracle="""
WITH p AS (
  SELECT doc_id,
         16 + (doc_id % 5) * 8 AS w,
         16 + (doc_id % 3) * 8 AS h,
         1 + doc_id % 4 AS nf
  FROM documents WHERE doc_id % 6 <> 5
),
fr AS (
  SELECT p.doc_id, p.w, p.h, t.i
  FROM p, UNNEST([0, 2]) AS t(i)
  WHERE t.i < p.nf
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(i * 40 AS BIGINT) AS frame_ts_ms,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(((doc_id * 31 + i * 7) % 255) * (w * h) + (w * h) // 2 AS BIGINT) AS luma_sum,
       CAST(w * h AS BIGINT) AS n_pixels
FROM fr
""",
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y4M frame decode with presentation-time sampling; per-frame luma statistics."""
    from bw_new_data_integration_spark.operators import multimodal

    docs = _fanout(spark, _t(spark, sf_dir, "documents").select("doc_id", "text"))

    import pandas as pd

    def gen(it):
        for pdf in it:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                if did % 6 == 5:  # corrupt: not a video stream
                    payloads.append((text or "x").encode("utf-8"))
                else:
                    payloads.append(
                        multimodal.make_y4m(
                            16 + int(did % 5) * 8,
                            16 + int(did % 3) * 8,
                            1 + int(did % 4),
                            seed=int(did),
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id bigint, payload binary")
    return multimodal.sample_y4m_frames(
        media, payload_col="payload", id_col="doc_id", every_ms=80
    )


# ---------------------------------------------------------------------------
# Multimodal thumbnails (round 5): decode → nearest-neighbor resize to
# 8×8 → integer-exact stats. NN resize is the oracle-replayable form
# (output (y,x) samples source (floor(y*h/8), floor(x*w/8)) of the
# formula image); PNG and GIF arms both exercised, corrupt payloads
# yield null rows. Completes the decode/feature/resize/frame-sample
# quartet of the multimodal plumbing.
# ---------------------------------------------------------------------------
@register(
    "mm_image_thumbnails",
    oracle="""
WITH dims AS (
  SELECT doc_id, CAST((doc_id % 29) + 1 AS BIGINT) AS w, CAST((doc_id % 13) + 1 AS BIGINT) AS h
  FROM documents WHERE doc_id % 4 IN (0, 1)
),
grid AS (
  SELECT doc_id, w, h, tx.r AS x, ty.r AS y,
         (tx.r * w) // 8 AS sx, (ty.r * h) // 8 AS sy
  FROM dims, range(0, 8) tx(r), range(0, 8) ty(r)
),
px AS (
  SELECT doc_id, x, y, (sx * 31 + sy * 17 + doc_id) % 256 AS p FROM grid
)
SELECT doc_id,
       CAST(SUM(p) AS BIGINT) AS pix_sum,
       CAST(MAX(CASE WHEN x = 0 AND y = 0 THEN p END) AS INT) AS first_px,
       CAST(MAX(CASE WHEN x = 7 AND y = 7 THEN p END) AS INT) AS last_px
FROM px GROUP BY doc_id
UNION ALL
SELECT doc_id, CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT)
FROM documents WHERE doc_id % 4 IN (2, 3)
""",
)
def mm_image_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real thumbnail resize over decoded image bytes (Arrow mapInPandas, area-mean downsample)."""
    from bw_new_data_integration_spark.operators import multimodal

    docs = _fanout(spark, _t(spark, sf_dir, "documents").select("doc_id", "text"))

    import pandas as pd

    def gen(it):
        for pdf in it:
            payloads = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                kind = did % 4
                w, h = int(did % 29) + 1, int(did % 13) + 1
                if kind == 0:
                    payloads.append(
                        multimodal.make_png(w, h, seed=int(did), filter_type=int(did // 4) % 5)
                    )
                elif kind == 1:
                    payloads.append(multimodal.make_gif(w, h, seed=int(did)))
                elif kind == 2:  # header-only JPEG: undecodable -> null row
                    payloads.append(multimodal.make_jpeg_header(32, 32))
                else:  # corrupt
                    payloads.append((text or "x").encode("utf-8"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id bigint, payload binary")
    thumbs = multimodal.extract_thumbnails(media, payload_col="payload", id_col="doc_id")
    return thumbs.select("doc_id", "pix_sum", "first_px", "last_px")
