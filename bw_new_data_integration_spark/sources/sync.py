"""Incremental keyed-table → batched-REST-sink synchronization.

The reference's nightly job re-pushes the WHOLE trailing window to the
Dataverse API every run (modules/olap_sync.py:111-151 re-aggregates,
then modules/dataverse.py upserts every row; truenas/cron-jobs.txt
schedules it) — at its measured 1,800–2,600 rows/s the API is the
bottleneck, so pushed rows are the scarcest resource in the whole
pipeline. This module replaces the re-push with a CHANGE-DRIVEN sync:
only rows that changed since the last synced table version are
upserted, only vanished keys are deleted, everything else never leaves
the cluster. Composed with a maintained rollup
(operators/matview.py + plans/matview_pipeline.py), the entire
reference flow — source → landing table → grain rollup → REST sink —
runs O(churn) end to end.

Delivery contract: AT-LEAST-ONCE with an idempotent sink. The sink's
keyed upsert (PATCH on the alternate key — K1) is idempotent and its
delete tolerates already-absent keys, so a crash between the push and
the watermark write only re-pushes the same delta. The watermark is a
``_sync_state_<app>.json`` sidecar next to the table (same shape as the
matview state sidecar: table path + synced version). The watermark only
advances when EVERY batch landed (``errors == 0``) — a partially failed
push leaves the watermark in place so the next run re-pushes the whole
span (idempotent), never silently skipping the failed rows.

Retention race: when vacuum removed the last-synced snapshot, the sync
re-bootstraps from the full current snapshot. Upserts are covered by
the re-push; DELETIONS that happened inside the lost span are
reconciled by diffing the sink's current key set (``list_sink_keys``)
against the snapshot — keys at the sink but absent from the snapshot
get tombstones. Without a ``list_sink_keys`` callable the re-bootstrap
cannot see the sink's orphans; the returned stats carry
``deletes_unreconciled: True`` so the caller knows rows may linger.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bw_new_data_integration_spark.sources import odata
from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable


def _state_path(table: ParquetKeyedTable, app: str) -> str:
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", app)
    return os.path.join(table.path, f"_sync_state_{safe}.json")


def _read_state(table: ParquetKeyedTable, app: str) -> dict | None:
    try:
        with open(_state_path(table, app)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_state(table: ParquetKeyedTable, app: str, version: int) -> None:
    tmp = _state_path(table, app) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"table_path": table.path, "version": version}, f)
    os.replace(tmp, _state_path(table, app))


def net_changes(
    spark: SparkSession,
    table: ParquetKeyedTable,
    from_version: int,
    to_version: int,
) -> DataFrame:
    """The NET per-key outcome of every commit in ``(from, to]`` — what
    a state-mirroring consumer (a REST sink, a search index) must
    apply: one row per changed key, ``_change_type`` ∈ {insert,
    update_postimage, delete}. Intermediate states collapse away (a key
    updated five times then deleted yields one delete).

    When every commit in the span is CDC-tracked this collapses the
    O(batch) per-commit events (latest commit wins per key, preimages
    dropped); otherwise it is exactly ``table.changes`` — the snapshot
    diff, which is net by construction."""
    if all(table.has_commit_changes(v) for v in range(from_version + 1, to_version + 1)):
        ev = table.commit_changes(spark, from_version, to_version)
        ev = ev.where(F.col("_change_type") != "update_preimage")
        w = Window.partitionBy(*table.key_cols).orderBy(F.desc("_commit_version"))
        last = (
            ev.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "_commit_version")
        )
        # a key inserted AND deleted within the span nets to nothing for
        # a sink that never saw it — but the sink may have seen it if a
        # previous sync already pushed part of this span; the watermark
        # only ever advances whole spans, so a trailing delete is safe
        # to push (idempotent) and required when the key predates the
        # span. Keep deletes for keys that existed at from_version only
        # when cheap to know; pushing an extra delete is harmless.
        return last
    return table.changes(spark, from_version, to_version, include_preimages=False)


def sync_to_rest(
    spark: SparkSession,
    table: ParquetKeyedTable,
    transport_factory: Callable[[], odata.Transport],
    key_col: str,
    app: str = "rest_sync",
    finish: Callable[[DataFrame], DataFrame] | None = None,
    batch_size: int = 400,
    delete_batch_size: int = 100,
    concurrency: int = 6,
    list_sink_keys: Callable[[], "list | None"] | None = None,
) -> dict:
    """Push the table's changes since the last sync to a batched keyed
    REST sink (K1 write discipline: 400/batch, retry ×5,
    429/Retry-After, refresh-on-401 — ``odata.write_batched``).

    ``finish`` maps changed TABLE rows to SINK records (e.g.
    ``plans.pipeline.finish_plan`` for a pipeline-shaped rollup: it
    derives the business key and applies the mapping; it must be
    row-local, which every finish_plan stage is). It is applied to the
    changed subset only — and to DELETE preimages too, so the sink key
    of a vanished row is derived from the same template. ``key_col``
    names the sink's alternate key in ``finish``'s output.

    ``list_sink_keys`` (optional) returns the sink's CURRENT key values
    (e.g. a paged ``$select=key`` scan); used only on a vacuum-forced
    re-bootstrap to reconcile deletions the lost change span would have
    carried. First call pushes the full current snapshot (bootstrap).
    Returns stats: versions spanned, upserted/deleted row counts, sink
    batch counts, errors, and ``watermark_advanced``."""
    current = table.current_version()
    if current < 0:
        raise ValueError("table has no committed version")
    st = _read_state(table, app)
    frm = (
        int(st["version"])
        if st and st.get("table_path") == table.path
        else None
    )
    # retention raced the sync: the last-synced snapshot was vacuumed,
    # so no change feed from it exists — re-push the full snapshot
    # (idempotent sink ops make the re-push safe), same operational
    # guard as the matview refresh
    rebootstrap = False
    if frm is not None and not os.path.isdir(table._snapshot_dir(frm)):
        frm = None
        rebootstrap = True
    finish = finish or (lambda df: df)
    if frm is not None and frm >= current:
        return {"action": "noop", "from_version": frm, "to_version": current,
                "upserted": 0, "deleted": 0, "errors": 0,
                "watermark_advanced": False}
    if frm is None:
        snapshot = finish(table.read(spark))
        stats = odata.write_batched(
            snapshot, transport_factory, key_col,
            batch_size=batch_size, concurrency=concurrency,
        )
        deleted = 0
        del_errors = 0
        del_batches = 0
        deletes_unreconciled = False
        if rebootstrap:
            # the lost span may have carried deletes the re-push cannot
            # express: keys now at the sink but absent from the
            # snapshot must get tombstones, or they linger forever
            if list_sink_keys is not None:
                sink_keys = list(list_sink_keys() or [])
                if sink_keys:
                    orphans = (
                        spark.createDataFrame(
                            [(k,) for k in sink_keys], [key_col]
                        )
                        .join(snapshot.select(key_col), [key_col], "left_anti")
                    )
                    ds = odata.delete_batched(
                        orphans, transport_factory, key_col,
                        batch_size=delete_batch_size, concurrency=concurrency,
                    )
                    deleted = ds["created"] + ds["updated"]
                    del_errors = ds["errors"]
                    del_batches = ds["batches"]
            else:
                deletes_unreconciled = True
        errors = stats["errors"] + del_errors
        advanced = errors == 0
        if advanced:
            _write_state(table, app, current)
        out = {"action": "rebootstrap" if rebootstrap else "bootstrap",
               "from_version": None, "to_version": current,
               "upserted": stats["created"] + stats["updated"],
               "deleted": deleted,
               "sink_batches": stats["batches"] + del_batches,
               "errors": errors, "watermark_advanced": advanced}
        if rebootstrap and deletes_unreconciled:
            out["deletes_unreconciled"] = True
        return out
    net = net_changes(spark, table, frm, current)
    # both branches reuse the net frame: pin it (small: changed keys)
    # branch counts ride the pin job as an Observation: an empty side
    # then skips its whole push job (repartition + foreachPartition +
    # a Python worker round per task, ~0.5 s at gate scale for zero
    # rows — a pure-upsert span paid it every sync)
    n_up = n_del = None
    try:
        import uuid as _uuid

        from pyspark.sql import Observation

        obs = Observation("sync_net_" + _uuid.uuid4().hex[:8])
        net = net.observe(
            obs,
            F.sum(F.when(F.col("_change_type") == "delete", 1).otherwise(0)).alias("n_del"),
            F.count(F.lit(1)).alias("n_all"),
        )
        net = net.localCheckpoint(eager=True)
        m = obs.get
        n_del = int(m["n_del"] or 0)
        n_up = int(m["n_all"] or 0) - n_del
    except Exception:
        pass
    _zero = {"created": 0, "updated": 0, "errors": 0, "batches": 0}
    upserts = finish(net.where(F.col("_change_type") != "delete").drop("_change_type"))
    deletes = finish(net.where(F.col("_change_type") == "delete").drop("_change_type"))
    up_stats = _zero if n_up == 0 else odata.write_batched(
        upserts, transport_factory, key_col,
        batch_size=batch_size, concurrency=concurrency,
    )
    del_stats = _zero if n_del == 0 else odata.delete_batched(
        deletes.select(key_col), transport_factory, key_col,
        batch_size=delete_batch_size, concurrency=concurrency,
    )
    errors = up_stats["errors"] + del_stats["errors"]
    # at-least-once: a failed batch means part of the span never
    # reached the sink — leave the watermark where it was so the NEXT
    # sync replays the whole span (idempotent PATCH/DELETE make the
    # replay safe); advancing here would skip the failed rows forever
    advanced = errors == 0
    if advanced:
        _write_state(table, app, current)
    return {
        "action": "incremental",
        "from_version": frm,
        "to_version": current,
        "upserted": up_stats["created"] + up_stats["updated"],
        "deleted": del_stats["created"] + del_stats["updated"],
        "sink_batches": up_stats["batches"] + del_stats["batches"],
        "errors": errors,
        "watermark_advanced": advanced,
    }
