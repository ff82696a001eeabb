"""Clean-room Delta transaction log reader — TEST-ONLY second implementation.

Written solely from the public Delta Lake protocol specification
(delta-io/delta PROTOCOL.md): log discovery under ``_delta_log/``,
parquet-checkpoint loading, JSON-delta replay with add/remove
reconciliation keyed on path, percent-encoded path resolution,
``partitionValues`` typing from the ``metaData.schemaString``, and
``add.stats`` parsing. It shares NO code with
``sources/parquet_target.py``'s exporter — pyarrow + stdlib only, no
imports from the engine package — so agreement between the two is real
cross-validation, the same dual-implementation discipline as
``operators/bloom.py``'s two probe paths (VERDICT r6 #2: the
``deltalake`` wheel cannot be installed offline).

Protocol facts this reader relies on (all public spec):

- delta files are ``{version:020d}.json`` of newline-delimited action
  objects; checkpoints are ``{version:020d}.checkpoint.parquet`` with
  one action per row in nullable per-action-type struct columns.
- a snapshot at version V = the latest checkpoint at version <= V,
  then delta files (ckpt, V] replayed in ascending version order;
  without a checkpoint the log must start at version 0.
- reconciliation: ``add`` upserts the live set keyed on ``path``;
  ``remove`` (a tombstone) deletes that key.
- ``add.path`` is percent-encoded and relative to the table root.
- partition column values come from ``add.partitionValues`` (stringly,
  null for the hive default partition), NOT from the data files; their
  types come from ``metaData.schemaString`` (a Spark StructType JSON).
- ``add.stats`` is a JSON string: numRecords / minValues / maxValues /
  nullCount.
- ``_last_checkpoint`` is a hint naming the latest checkpoint version.
"""

from __future__ import annotations

import datetime
import json
import os
import re
from urllib.parse import unquote

_DELTA_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")


class CleanRoomSnapshot:
    def __init__(self, table_root: str, version: int, protocol: dict,
                 metadata: dict, live_adds: dict[str, dict],
                 txns: dict[str, int] | None = None):
        self.table_root = table_root
        self.version = version
        self.protocol = protocol
        self.metadata = metadata
        self.live_adds = live_adds  # encoded path -> add action
        # SetTransaction reconciliation (spec: latest txn per appId)
        self.txns = txns or {}

    @property
    def schema_fields(self) -> dict[str, str]:
        """column name -> Spark type name, from metaData.schemaString."""
        st = json.loads(self.metadata["schemaString"])
        return {f["name"]: f["type"] for f in st["fields"]}

    def data_paths(self) -> list[str]:
        """Filesystem paths of the live files (spec: percent-decode each
        path segment, resolve against the table root)."""
        out = []
        for enc in sorted(self.live_adds):
            rel = "/".join(unquote(seg) for seg in enc.split("/"))
            out.append(os.path.join(self.table_root, rel))
        return out

    def to_pandas(self):
        """Materialize the snapshot: read every live file, attach typed
        partition-column values from add.partitionValues."""
        import pandas as pd
        import pyarrow.parquet as pq

        types = self.schema_fields
        part_cols = list(self.metadata.get("partitionColumns") or [])
        frames = []
        for enc in sorted(self.live_adds):
            add = self.live_adds[enc]
            rel = "/".join(unquote(seg) for seg in enc.split("/"))
            df = pq.read_table(os.path.join(self.table_root, rel)).to_pandas()
            pv = _as_dict(add.get("partitionValues"))
            for c in part_cols:
                df[c] = _typed_partition_value(pv.get(c), types.get(c, "string"))
            frames.append(df)
        if not frames:
            return pd.DataFrame(columns=list(types))
        return pd.concat(frames, ignore_index=True)

    def stats(self) -> dict[str, dict]:
        """encoded path -> parsed add.stats dict (only files that carry
        stats)."""
        out = {}
        for enc, add in self.live_adds.items():
            s = add.get("stats")
            if s:
                out[enc] = json.loads(s)
        return out


def _as_dict(v) -> dict:
    """pyarrow map columns round-trip as lists of (k, v) pairs."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return v
    return dict(v)


def _typed_partition_value(raw: str | None, spark_type: str):
    """Deserialize a partitionValues string per the spec's partition
    value serialization rules (null stays null)."""
    if raw is None:
        return None
    if spark_type in ("integer", "long", "short", "byte"):
        return int(raw)
    if spark_type in ("double", "float") or spark_type.startswith("decimal"):
        return float(raw)
    if spark_type == "boolean":
        return raw == "true"
    if spark_type == "date":
        return datetime.date.fromisoformat(raw)
    return raw


def _apply_action(action: dict, state: dict) -> None:
    if "protocol" in action and action["protocol"] is not None:
        state["protocol"] = action["protocol"]
    if "metaData" in action and action["metaData"] is not None:
        state["metadata"] = action["metaData"]
    a = action.get("add")
    if a is not None:
        state["live"][a["path"]] = a
    r = action.get("remove")
    if r is not None:
        state["live"].pop(r["path"], None)
    t = action.get("txn")
    if t is not None:
        state["txns"][t["appId"]] = int(t["version"])


def load_snapshot(table_root: str, version: int | None = None) -> CleanRoomSnapshot:
    """Reconstruct the table state at ``version`` (default: latest)."""
    import pyarrow.parquet as pq

    log_dir = os.path.join(table_root, "_delta_log")
    deltas: dict[int, str] = {}
    ckpts: dict[int, str] = {}
    for fn in os.listdir(log_dir):
        m = _DELTA_RE.match(fn)
        if m:
            deltas[int(m.group(1))] = os.path.join(log_dir, fn)
        m = _CKPT_RE.match(fn)
        if m:
            ckpts[int(m.group(1))] = os.path.join(log_dir, fn)
    if not deltas and not ckpts:
        raise FileNotFoundError(f"no delta log under {log_dir}")
    latest = max(list(deltas) + list(ckpts))
    if version is None:
        version = latest
        # honor (and sanity-check) the _last_checkpoint hint when present
        lc = os.path.join(log_dir, "_last_checkpoint")
        if os.path.exists(lc):
            with open(lc) as fh:
                hint = json.load(fh)["version"]
            if hint not in ckpts:
                raise ValueError(f"_last_checkpoint names missing version {hint}")

    state = {"protocol": None, "metadata": None, "live": {}, "txns": {}}
    usable = [cv for cv in ckpts if cv <= version]
    start = 0
    if usable:
        cv = max(usable)
        for row in pq.read_table(ckpts[cv]).to_pylist():
            _apply_action(row, state)
        start = cv + 1
    elif 0 not in deltas:
        raise ValueError(
            "log neither starts at version 0 nor has a checkpoint <= "
            f"{version}: unreadable per the Delta protocol"
        )
    for v in range(start, version + 1):
        if v not in deltas:
            # spec: versions must be contiguous after the checkpoint
            raise ValueError(f"missing delta file for version {v}")
        with open(deltas[v]) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _apply_action(json.loads(line), state)
    if state["protocol"] is None or state["metadata"] is None:
        raise ValueError("replayed log has no protocol/metaData action")
    if state["protocol"]["minReaderVersion"] > 1:
        raise ValueError("table requires a newer reader per its protocol action")
    return CleanRoomSnapshot(
        table_root, version, state["protocol"], state["metadata"], state["live"],
        txns=state["txns"],
    )
