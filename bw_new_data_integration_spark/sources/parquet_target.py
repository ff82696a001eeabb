"""Keyed analytic target table over parquet snapshots.

Stands in for the reference's Dataverse tables (alternate-key upsert
target, ``modules/dataverse.py:40-220``) in an environment without
Delta/Iceberg jars. Semantics provided:

- **upsert** (K1/J4): deterministic MERGE — source deduped per key,
  matched target rows replaced, new keys appended,
- **delete** (K2): anti-join by key set,
- **overwrite** (full refresh),
- snapshot isolation: each commit writes a new ``v=N`` directory and
  flips a ``_LATEST`` pointer afterwards — readers of the previous
  snapshot are never disturbed, and a crashed writer leaves the
  pointer (and thus the table) unchanged.

With Delta on the classpath the same API maps 1:1 onto ``MERGE INTO``
/ ``DELETE FROM`` — this class is the portability shim, not the
design. At 100 TB you would partition the snapshot by a date/fiscal
column and MERGE only touched partitions; ``partition_by`` wires that
through.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from bw_new_data_integration_spark.operators.merge import (
    dedupe_latest,
    delete_matching,
    merge_upsert,
)


class ParquetKeyedTable:
    def __init__(
        self,
        path: str,
        key_cols: Sequence[str],
        partition_by: Sequence[str] = (),
    ) -> None:
        self.path = path
        self.key_cols = list(key_cols)
        self.partition_by = list(partition_by)

    # -- snapshot bookkeeping ------------------------------------------------

    def _latest_file(self) -> str:
        return os.path.join(self.path, "_LATEST")

    def current_version(self) -> int:
        try:
            with open(self._latest_file()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return -1

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def exists(self) -> bool:
        return self.current_version() >= 0

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """Read the latest snapshot, or a specific ``version`` (time
        travel — every commit keeps its ``v=N`` directory, so any past
        state of the table is addressable, like Delta's VERSION AS OF)."""
        v = self.current_version() if version is None else version
        if v < 0 or (version is not None and version > self.current_version()):
            return None
        return spark.read.parquet(self._snapshot_dir(v))

    def _commit(self, df: DataFrame) -> int:
        new_v = self.current_version() + 1
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self._snapshot_dir(new_v))
        os.makedirs(self.path, exist_ok=True)
        tmp = self._latest_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, self._latest_file())  # atomic pointer flip
        return new_v

    # -- operations ----------------------------------------------------------

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(df)

    def upsert(
        self,
        spark: SparkSession,
        source: DataFrame,
        order_by: Sequence[str] | None = None,
        evolve_schema: bool = False,
    ) -> int:
        """Idempotent keyed upsert. ``order_by`` defines within-batch
        last-write-wins (the reference's thread-pool races made this
        nondeterministic; here it is explicit). ``evolve_schema=True``
        lets the source add new columns to the table (K5)."""
        if order_by:
            source = dedupe_latest(source, self.key_cols, order_by, desc=True)
        else:
            source = source.dropDuplicates(self.key_cols)
        target = self.read(spark)
        merged = (
            source
            if target is None
            else merge_upsert(target, source, self.key_cols, evolve_schema=evolve_schema)
        )
        return self._commit(merged)

    def delete_keys(self, spark: SparkSession, keys_df: DataFrame) -> int:
        target = self.read(spark)
        if target is None:
            return self.current_version()
        return self._commit(delete_matching(target, keys_df, self.key_cols))

    def compact(self, spark: SparkSession, target_rows_per_file: int = 1_000_000) -> int:
        """Rewrite the current snapshot into right-sized files (Delta's
        OPTIMIZE). Incremental merges leave each snapshot with as many
        files as shuffle partitions; at 100 TB the small-files problem
        compounds per commit — scan task count (and NameNode/listing
        pressure) grows with file count, not data size. Data is
        unchanged: same rows, new layout, new addressable version.
        Sorting within files by the table key keeps parquet min/max
        stats selective for key lookups."""
        target = self.read(spark)
        if target is None:
            return self.current_version()
        n = max(1, target.count() // max(1, target_rows_per_file))
        compacted = target.repartition(n, *self.key_cols).sortWithinPartitions(*self.key_cols)
        return self._commit(compacted)
