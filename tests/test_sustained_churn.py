"""Sustained-churn steady state for merge-on-read tables (VERDICT r12
#4, carried from r11 #8): 100+ MoR commits with ``maybe_compact`` after
each, for BOTH the unpartitioned and the hive-partitioned variant. The
3-5 commit lifecycle gates prove correctness; this pins the *policy*:
tombstone-sidecar debt and write-version union width must stay bounded
by the documented thresholds at steady state instead of growing with
commit count, and the final table state must equal the batch recompute.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

N_COMMITS = 110  # > 100 churn waves (each an upsert or a delete)
N_KEYS = 400  # key universe; every wave touches an interleaved slice


def _wave(spark, i: int):
    """Deterministic churn: wave i upserts keys ≡ i (mod 7) with a
    value stamped by the wave, and every 5th wave deletes keys
    ≡ i (mod 11) instead."""
    ks = [k for k in range(N_KEYS) if k % 7 == i % 7]
    rows = [(k, float(k * 1000 + i), f"m{k % 12}") for k in ks]
    return spark.createDataFrame(rows, "k bigint, v double, month string")


def _del_keys(spark, i: int, partitioned: bool):
    if partitioned:  # composite key (k, month) — month is derivable
        ks = [(k, f"m{k % 12}") for k in range(N_KEYS) if k % 11 == i % 11]
        return spark.createDataFrame(ks, "k bigint, month string")
    ks = [(k,) for k in range(N_KEYS) if k % 11 == i % 11]
    return spark.createDataFrame(ks, "k bigint")


def _expected(spark, waves: list[tuple[str, int]]):
    """Replay the same churn with plain dict state."""
    state: dict[int, tuple[float, str]] = {}
    for op, i in waves:
        if op == "up":
            for k in range(N_KEYS):
                if k % 7 == i % 7:
                    state[k] = (float(k * 1000 + i), f"m{k % 12}")
        else:
            for k in list(state):
                if k % 11 == i % 11:
                    del state[k]
    return sorted((k, v, m) for k, (v, m) in state.items())


@pytest.mark.parametrize("partitioned", [False, True], ids=["flat", "hive"])
def test_mor_sustained_churn_steady_state(spark, tmp_path, partitioned):
    t = ParquetKeyedTable(
        str(tmp_path / "t"),
        ["k", "month"] if partitioned else ["k"],
        write_mode="mor",
        partition_by=["month"] if partitioned else (),
    )
    waves: list[tuple[str, int]] = []
    max_sets = 0
    max_wv = 0
    max_tomb_frac = 0.0
    compactions = 0
    last_op = None
    for i in range(N_COMMITS):
        if i and i % 5 == 0:
            t.delete_keys(spark, _del_keys(spark, i, partitioned))
            waves.append(("del", i))
        else:
            t.upsert(spark, _wave(spark, i))
            waves.append(("up", i))
        t.maybe_compact(spark)
        m = t.manifest()
        op = m.get("operation")
        if op in ("compact", "compact_where", "compact_tombstones"):
            compactions += 1
            last_op = op
        tombs = m.get("tombstones") or []
        files = m["files"]
        max_sets = max(max_sets, len({int(tb["tv"]) for tb in tombs}))
        max_wv = max(max_wv, len({int(f.get("wv", 0)) for f in files}))
        trows = sum(tb.get("rows") or 0 for tb in tombs)
        drows = sum(f.get("rows") or 0 for f in files)
        if drows:
            max_tomb_frac = max(max_tomb_frac, trows / drows)

    # policy bounds hold at EVERY commit, not just the end: sidecar-set
    # count and write-version union width stay within one wave of their
    # fold thresholds, dead-row share within one wave of the rewrite
    # threshold (the post-commit maybe_compact folds the overshoot
    # before the next commit lands).
    cls = ParquetKeyedTable
    assert max_sets <= cls.MOR_MINOR_COMPACT_SETS + 1, max_sets
    assert max_wv <= cls.MOR_COMPACT_MAX_WV_GROUPS + 1, max_wv
    assert max_tomb_frac <= cls.MOR_COMPACT_TOMBSTONE_FRACTION + 0.35, max_tomb_frac
    assert compactions >= 1, "churn this deep must trigger the policy"

    # steady state is clean at the end too: after a final explicit
    # compact, no sidecars remain and the state equals the replay
    t.compact(spark)
    m = t.manifest()
    assert not (m.get("tombstones") or [])
    got = sorted(
        (r["k"], r["v"], r["month"])
        for r in t.read(spark).select("k", "v", "month").collect()
    )
    assert got == _expected(spark, waves)
