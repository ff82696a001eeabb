"""Cross-validation tests gated on OPTIONAL external libraries.

Both libraries are absent from the build container (no network — the
attempted installs are documented in docs/ROUND6_NOTES.md), so these
tests ``importorskip`` here and activate automatically the moment the
environment provides the wheels (VERDICT r6 #8). Skip reason is the
import itself, so a CI image with the wheels runs them with zero
changes.

- PIL: a real native decoder dropped into the FROZEN codec seam
  (operators/multimodal.py `default_gray_decoder` contract) must
  reproduce the pure-Python pipeline's output bit-for-bit on lossless
  formats (PNG/GIF).
- deltalake: the reference Delta reader pointed at export_delta_log's
  output must see the same rows as the engine, per version — the
  authoritative version of tests/test_delta_clean_room.py's clean-room
  check.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row


def test_pil_decoder_through_frozen_seam(spark):
    PIL_Image = pytest.importorskip("PIL.Image", reason="PIL not installed")
    import io

    import numpy as np

    from bw_new_data_integration_spark.operators import multimodal as mm

    def pil_gray_decoder(payload: bytes):
        """Drop-in native decoder honoring the frozen seam contract:
        bytes -> 2-D uint8 luma array, None for undecodable."""
        try:
            img = PIL_Image.open(io.BytesIO(bytes(payload)))
            return np.asarray(img.convert("L"), dtype=np.uint8)
        except Exception:
            return None

    rows = [
        Row(doc_id=i, payload=mm.make_png(5 + i, 4 + i, seed=i, filter_type=i % 5))
        for i in range(5)
    ] + [Row(doc_id=100 + i, payload=mm.make_gif(6 + i, 3 + i, seed=i)) for i in range(3)]
    rows.append(Row(doc_id=999, payload=b"not an image"))  # corrupt-blob contract
    df = spark.createDataFrame(rows)

    # raw decode parity first (localizes a failure to the codec, not
    # the Spark plumbing)
    for r in rows[:-1]:
        ours = mm.default_gray_decoder(r.payload)
        theirs = pil_gray_decoder(r.payload)
        assert theirs is not None and ours is not None
        assert ours.shape == theirs.shape
        assert (ours == theirs).all(), f"doc {r.doc_id}: codec mismatch"

    base = {
        r["doc_id"]: tuple(r)
        for r in mm.extract_thumbnails(df, decoder=None).collect()
    }
    pil = {
        r["doc_id"]: tuple(r)
        for r in mm.extract_thumbnails(df, decoder=pil_gray_decoder).collect()
    }
    assert base == pil
    assert base[999][1] is None  # corrupt payload: null row from BOTH


def test_deltalake_reader_reads_export(spark, tmp_path):
    deltalake = pytest.importorskip("deltalake", reason="deltalake not installed")

    from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

    t = ParquetKeyedTable(
        str(tmp_path / "t"), ["part", "k"], partition_by=["part"], stats_cols=["v"]
    )
    d0 = datetime.date(2024, 1, 1)
    t.overwrite(
        spark.createDataFrame(
            [Row(part=f"p{i % 3}", k=i, v=float(i), d=d0) for i in range(30)]
        )
    )
    t.upsert(spark, spark.createDataFrame([Row(part="p0", k=1, v=-1.0, d=d0)]))
    t.export_delta_log(spark)

    def canon_arrow(tbl):
        pdf = tbl.to_pandas()
        return sorted(
            map(tuple, pdf[sorted(pdf.columns)].astype(str).itertuples(index=False))
        )

    def canon_spark(df):
        cols = sorted(df.columns)
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    dt = deltalake.DeltaTable(t.path)
    assert dt.version() == t.current_version()
    assert canon_arrow(dt.to_pyarrow_table()) == canon_spark(t.read(spark))
    dt.load_as_version(0)
    assert canon_arrow(dt.to_pyarrow_table()) == canon_spark(t.read(spark, version=0))

    # post-vacuum: the truncated log must still open via the checkpoint
    t.upsert(spark, spark.createDataFrame([Row(part="p1", k=2, v=-2.0, d=d0)]))
    t.vacuum(keep_last=2)
    t.export_delta_log(spark)
    dt2 = deltalake.DeltaTable(t.path)
    assert canon_arrow(dt2.to_pyarrow_table()) == canon_spark(t.read(spark))
