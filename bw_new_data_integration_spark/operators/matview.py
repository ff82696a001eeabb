"""Incremental materialized-view (rollup) maintenance from the keyed
table's change data feed.

The reference recomputes every aggregate from scratch on each sync
(modules/olap_sync.py re-pulls and re-aggregates the full slice; the
nightly cron re-syncs a whole trailing window, truenas/cron-jobs.txt).
At 100 TB a from-scratch rollup is a full-table scan per refresh; the
scale-correct shape is *algebraic view maintenance*: additive measures
(SUM / COUNT) are updated from the signed change feed alone —

    insert / update_postimage  →  +value
    delete / update_preimage   →  -value

so a refresh costs O(churn in the base) + O(changed groups in the
rollup), never O(base). The feed itself is file-pruned
(``ParquetKeyedTable.changes``: hard-link identity excludes carried-
forward files), and the rollup write is the ordinary range-scoped
merge, so both ends of the refresh touch only what moved.

Exactness: measures are summed as DECIMAL(27,6) and stored as
DECIMAL(38,6). Decimal addition is exact and associative, so the
incrementally-maintained rollup is BIT-equal to a from-scratch
recompute — the k11 gate's DuckDB oracle proves exactly that. (Float
sums would drift: (a+b)-b != a in IEEE754.)
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

# sums are exact under this pair: cast-to-(27,6) before the sum bounds
# each term; the stored (38,6) leaves 11 integer digits of headroom for
# the running total (overflow → null under non-ANSI arithmetic, which
# the n_rows invariant would surface as a hash mismatch, never silence)
_TERM_TYPE = "decimal(27,6)"
_STORE_TYPE = "decimal(38,6)"


def _state_path(rollup: ParquetKeyedTable) -> str:
    return os.path.join(rollup.path, "_matview_state.json")


def _read_state(rollup: ParquetKeyedTable) -> dict | None:
    try:
        with open(_state_path(rollup)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_state(rollup: ParquetKeyedTable, state: dict) -> None:
    os.makedirs(rollup.path, exist_ok=True)
    tmp = _state_path(rollup) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(rollup))


def _full_rollup(
    base_df: DataFrame,
    group_cols: Sequence[str],
    sum_measures: Mapping[str, str],
    count_col: str,
    min_measures: Mapping[str, str] | None = None,
    max_measures: Mapping[str, str] | None = None,
) -> DataFrame:
    aggs = [
        F.sum(F.col(src).cast(_TERM_TYPE)).cast(_STORE_TYPE).alias(out)
        for out, src in sum_measures.items()
    ]
    aggs += [F.min(src).alias(out) for out, src in (min_measures or {}).items()]
    aggs += [F.max(src).alias(out) for out, src in (max_measures or {}).items()]
    aggs.append(F.count(F.lit(1)).alias(count_col))
    return base_df.groupBy(*group_cols).agg(*aggs)


def maintain_rollup(
    spark: SparkSession,
    base: ParquetKeyedTable,
    rollup: ParquetKeyedTable,
    group_cols: Sequence[str],
    sum_measures: Mapping[str, str],
    count_col: str = "n_rows",
    min_measures: Mapping[str, str] | None = None,
    max_measures: Mapping[str, str] | None = None,
) -> dict:
    """Bring ``rollup`` (a grouped SUM/COUNT aggregate of ``base``,
    keyed on ``group_cols``) up to date with the base table's current
    version by applying only the change feed since the last refresh.

    First call bootstraps: full aggregate of the current base snapshot,
    written as the rollup's v0. Every later call reads
    ``base.changes(last_reflected, current, include_preimages=True)``
    — file-pruned, O(churn) — folds it into signed per-group deltas,
    and merges only the CHANGED groups into the rollup (range-scoped);
    groups whose row count reaches zero are deleted. A call with no
    base movement is a no-op (no new rollup commit).

    ``sum_measures`` maps rollup output column → base source column.
    Returns a stats dict: versions spanned, groups upserted/deleted.

    ``min_measures`` / ``max_measures`` maintain extrema. MIN/MAX are
    only *insert-monotone*: a new value folds in with
    least()/greatest(), but a DELETE (or update-preimage) that removes
    the stored extremum invalidates it. The classic maintenance rule
    applies: groups where any removed value ties-or-beats the stored
    extremum are re-aggregated from the base via a left-semi join —
    ONE base scan whose aggregate state is bounded by the affected
    groups (the scan itself reads the base once; group columns are
    rarely the base's cluster key, so file skipping seldom applies) —
    while every other group stays incremental. Insert-heavy feeds
    almost never pay the recompute; SUM/COUNT remain pure-delta
    regardless.

    Concurrency: one refresher per rollup at a time. The rollup's
    commits take the table write lock, but the ``_matview_state.json``
    read→refresh→write cycle is not atomic across two concurrent
    callers — serialize refreshes (the scheduler-level interlock the
    runner's ``--confirm`` path already provides for sinks).
    """
    group_cols = list(group_cols)
    if list(rollup.key_cols) != group_cols:
        raise ValueError(
            f"rollup key_cols {rollup.key_cols} must equal group_cols {group_cols}"
        )
    current = base.current_version()
    if current < 0:
        raise ValueError("base table has no committed version")

    # Applied-through version = max(state sidecar, the txn marker the
    # last delta-carrying commit stamped into the rollup's own manifest
    # — Delta SetTransaction). The marker lands ATOMICALLY with the
    # commit, so a crash between the commit and the sidecar write can
    # never double-apply a delta: the re-run sees the marker and noops.
    state = _read_state(rollup)
    state_v = int(state["base_version"]) if state else None
    txn = rollup.last_txn("matview") if rollup.exists() else None
    txn_v = (
        int(txn["base_version"])
        if txn and txn.get("base_path") == base.path
        else None
    )
    cands = [v for v in (state_v, txn_v) if v is not None]
    reflected = max(cands) if cands else None

    # retention raced the refresh: the last-reflected base snapshot was
    # vacuumed, so no change feed from it exists — fall back to a full
    # re-bootstrap (correct, just not incremental). At 100 TB this is
    # the operational guard for retention windows shorter than the
    # refresh lag.
    if reflected is not None and not os.path.isdir(base._snapshot_dir(reflected)):
        reflected = None

    min_measures = dict(min_measures or {})
    max_measures = dict(max_measures or {})
    if reflected is None or not rollup.exists():
        snap = _full_rollup(
            base.read(spark), group_cols, sum_measures, count_col,
            min_measures, max_measures,
        )
        rollup.set_commit_txn(
            {"app": "matview", "base_path": base.path, "base_version": current}
        )
        rollup.overwrite(snap)
        _write_state(rollup, {"base_path": base.path, "base_version": current})
        return {
            "action": "bootstrap",
            "from_version": None,
            "to_version": current,
            "groups_upserted": None,
            "groups_deleted": 0,
        }

    if reflected >= current:
        if state_v != reflected:  # heal a sidecar the crash left stale
            _write_state(rollup, {"base_path": base.path, "base_version": reflected})
        return {
            "action": "noop",
            "from_version": reflected,
            "to_version": current,
            "groups_upserted": 0,
            "groups_deleted": 0,
        }

    ch = base.changes(spark, reflected, current, include_preimages=True)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    added = sign == 1
    d_aggs = [
        F.sum(sign.cast(_TERM_TYPE) * F.col(src).cast(_TERM_TYPE))
        .cast(_STORE_TYPE)
        .alias(f"__d_{out}")
        for out, src in sum_measures.items()
    ]
    # per extremum: the best INSERTED value (folds in monotonically)
    # and the best REMOVED value (decides whether the stored extremum
    # might have left the group)
    for out, src in min_measures.items():
        d_aggs.append(F.min(F.when(added, F.col(src))).alias(f"__i_{out}"))
        d_aggs.append(F.min(F.when(~added, F.col(src))).alias(f"__r_{out}"))
    for out, src in max_measures.items():
        d_aggs.append(F.max(F.when(added, F.col(src))).alias(f"__i_{out}"))
        d_aggs.append(F.max(F.when(~added, F.col(src))).alias(f"__r_{out}"))
    d_aggs.append(F.sum(sign).alias("__d_rows"))
    delta = ch.groupBy(*group_cols).agg(*d_aggs)
    # the delta feeds its own key-bounds probe AND the join — pin it so
    # the (file-pruned, but still real) CDF plan executes once
    try:
        delta = delta.localCheckpoint(eager=True)
    except Exception:
        pass

    # rollup-side pruning: the left join below can only match rollup
    # rows whose leading group key falls inside the delta's key
    # interval, and range-clustered rollups persist per-file key bounds
    # — so a point-churn refresh reads O(touched rollup files), not the
    # whole rollup. Null group keys defeat the interval (read_where's
    # residual drops them), so their presence falls back to a full read.
    gk = group_cols[0]
    bounds = delta.agg(
        F.min(gk).alias("lo"),
        F.max(gk).alias("hi"),
        F.sum(F.when(F.col(gk).isNull(), 1).otherwise(0)).alias("nulls"),
    ).first()
    rollup_report = None
    if (
        bounds["lo"] is not None
        and not bounds["nulls"]
        and rollup.cluster == "range"
        and not rollup.partition_by
    ):
        cur, rollup_report = rollup.read_where(
            spark,
            [(gk, "between", (bounds["lo"], bounds["hi"]))],
            with_report=True,
        )
    else:
        cur = rollup.read(spark)
    # left join: only groups the feed touched flow; a measure delta can
    # be null (all contributing values null) — contributes nothing
    joined = delta.join(cur, on=group_cols, how="left")
    needs_recompute = F.lit(False)
    for out in min_measures:
        needs_recompute = needs_recompute | F.coalesce(
            F.col(f"__r_{out}") <= F.col(out), F.lit(False)
        )
    for out in max_measures:
        needs_recompute = needs_recompute | F.coalesce(
            F.col(f"__r_{out}") >= F.col(out), F.lit(False)
        )
    new = joined.select(
        *group_cols,
        *(
            (
                F.coalesce(F.col(out), F.lit(0).cast(_STORE_TYPE))
                + F.coalesce(F.col(f"__d_{out}"), F.lit(0).cast(_STORE_TYPE))
            )
            .cast(_STORE_TYPE)
            .alias(out)
            for out in sum_measures
        ),
        # least/greatest skip nulls: a brand-new group takes the
        # inserted extremum, an untouched-extremum group keeps its own
        *(F.least(F.col(out), F.col(f"__i_{out}")).alias(out) for out in min_measures),
        *(
            F.greatest(F.col(out), F.col(f"__i_{out}")).alias(out)
            for out in max_measures
        ),
        (
            F.coalesce(F.col(count_col), F.lit(0).cast("bigint"))
            + F.col("__d_rows")
        ).alias(count_col),
        needs_recompute.alias("__recompute"),
    )
    # the changed-group frame feeds two commits plus their counts —
    # materialize it once (it is small: changed groups only, never the
    # base or the full rollup). Spark Connect lacks localCheckpoint;
    # there the pure-JVM plan just recomputes per action (correct).
    try:
        new = new.localCheckpoint(eager=True)
    except Exception:
        pass
    alive = F.col(count_col) > 0
    dead = new.where(~alive).select(*group_cols)
    safe_live = new.where(alive & ~F.col("__recompute")).drop("__recompute")
    recomp_keys = new.where(alive & F.col("__recompute")).select(*group_cols)

    # one counting job for all three branches, off the checkpointed frame
    counts = {
        (r["alive"], r["rec"]): r["n"]
        for r in new.groupBy(
            alive.alias("alive"), F.col("__recompute").alias("rec")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_safe = int(counts.get((True, False), 0))
    n_recomp = int(counts.get((True, True), 0))
    deleted = int(counts.get((False, False), 0)) + int(counts.get((False, True), 0))

    live = safe_live
    if n_recomp:
        # extremum possibly removed: re-aggregate ONLY those groups
        # from the base (left-semi scopes the scan to their rows)
        live = safe_live.unionByName(
            _full_rollup(
                base.read(spark).join(recomp_keys, group_cols, "left_semi"),
                group_cols, sum_measures, count_col,
                min_measures, max_measures,
            )
        )
    # ORDER MATTERS for crash recovery: the dead-group delete is
    # idempotent (deleting absent keys is a no-op and a re-derived
    # delta re-flags the same groups dead), the live upsert is NOT
    # (it adds the delta). So delete first, then stamp the upsert
    # commit with the txn marker — if the process dies anywhere before
    # the marker lands, a full re-run converges; once it lands, the
    # re-run noops.
    upserted = n_safe + n_recomp
    if deleted:
        rollup.delete_keys(spark, dead)
    if upserted:
        rollup.set_commit_txn(
            {"app": "matview", "base_path": base.path, "base_version": current}
        )
        rollup.upsert(spark, live)

    _write_state(rollup, {"base_path": base.path, "base_version": current})
    return {
        "action": "incremental",
        "from_version": reflected,
        "to_version": current,
        "groups_upserted": upserted,
        "groups_recomputed": n_recomp,
        "groups_deleted": deleted,
        # rollup files the key-bounds pruning let the join skip (None
        # when pruning could not engage: null keys, unclustered layout)
        "rollup_files_read": (rollup_report or {}).get("files_read"),
        "rollup_files_total": (rollup_report or {}).get("files_total"),
    }
