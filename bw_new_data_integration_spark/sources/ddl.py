"""Declarative table specs + the create/key/publish lifecycle (K5).

The reference creates its target tables programmatically — typed
columns (``dataverse_table_creation/create_saleschanneldaily_table.py:
219-295``: String max-length, Decimal precision-2 ±1e11, Integer int32,
DateTime DateOnly/DateAndTime), then an alternate key on the business
key (``create_alternate_key_inventory.py``), polls until the key index
is active (``check_alternate_key_status.py``), and publishes the table
(``publish_table.py``). Schema evolution later widens columns
(``update_offers_decimal_ranges.py``).

Spark-first re-expression:

* ``TableSpec``/``ColumnSpec`` — the declarative surface. One spec
  yields (a) an explicit ``StructType`` (the engine's in-flight
  contract), (b) ``CREATE TABLE`` DDL for a metastore, (c) per-column
  validity predicates.
* ``validate_against_spec`` — the *semantic* half of the alternate-key
  workflow: value-range / length / nullability violations counted in
  ONE aggregate pass (no per-rule scans), the same shape as
  ``validate_expectations``. Key *uniqueness* enforcement lives in
  ``ParquetKeyedTable.upsert(strict=True)`` — together they give the
  constraint the reference delegates to the Dataverse key index.
* ``TableLifecycle`` — the ordered create → columns → alternate key →
  poll-active → publish workflow against an injected metadata client
  (production: a REST client; tests: a fake). No endpoints here.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class ColumnSpec:
    """One typed column, the reference's complete type system
    (SURVEY.md §1.3 — strictly flat scalars)."""

    name: str
    type: str  # 'string' | 'decimal' | 'int' | 'date' | 'datetime'
    max_length: int | None = None  # string
    precision: int = 2  # decimal digits after the point
    min_value: float | None = None  # decimal/int range
    max_value: float | None = None
    required: bool = False

    def spark_type(self) -> T.DataType:
        return {
            "string": T.StringType(),
            # Dataverse Decimal precision-2 range ±1e11 fits (13,2)
            "decimal": T.DecimalType(11 + self.precision, self.precision),
            "int": T.IntegerType(),
            "date": T.DateType(),
            "datetime": T.TimestampType(),
        }[self.type]

    def sql_type(self) -> str:
        return {
            "string": "STRING",
            "decimal": f"DECIMAL({11 + self.precision},{self.precision})",
            "int": "INT",
            "date": "DATE",
            "datetime": "TIMESTAMP",
        }[self.type]

    def violation_predicate(self, c: Column) -> Column:
        """TRUE where the value violates this column's contract."""
        checks: list[Column] = []
        if self.required:
            checks.append(c.isNull())
        if self.type == "string" and self.max_length is not None:
            checks.append(F.length(c) > self.max_length)
        if self.type in ("decimal", "int"):
            lo = self.min_value if self.min_value is not None else (
                -1e11 if self.type == "decimal" else -(2**31)
            )
            hi = self.max_value if self.max_value is not None else (
                1e11 if self.type == "decimal" else 2**31 - 1
            )
            checks.append(~c.between(F.lit(lo), F.lit(hi)) & c.isNotNull())
        if not checks:
            return F.lit(False)
        out = checks[0]
        for k in checks[1:]:
            out = out | k
        return out


@dataclass(frozen=True)
class TableSpec:
    name: str
    columns: tuple[ColumnSpec, ...]
    alternate_key: tuple[str, ...] = ()
    partition_by: tuple[str, ...] = ()
    comment: str = ""

    def __post_init__(self):
        names = {c.name for c in self.columns}
        missing = set(self.alternate_key) - names
        if missing:
            raise ValueError(f"alternate key references unknown columns: {sorted(missing)}")

    def struct_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type(), not c.required) for c in self.columns]
        )

    def create_table_sql(self, location: str | None = None, fmt: str = "parquet") -> str:
        cols = ",\n  ".join(
            f"{c.name} {c.sql_type()}" + (" NOT NULL" if c.required else "")
            for c in self.columns
        )
        ddl = f"CREATE TABLE IF NOT EXISTS {self.name} (\n  {cols}\n) USING {fmt}"
        if self.partition_by:
            ddl += f"\nPARTITIONED BY ({', '.join(self.partition_by)})"
        if location:
            ddl += f"\nLOCATION '{location}'"
        if self.comment:
            ddl += f"\nCOMMENT '{self.comment}'"
        return ddl


def validate_against_spec(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Per-column violation counts in ONE aggregate pass →
    rows (col_name, n_violations, n_checked). Scale shape: a single
    ordinary hash aggregate (map-side partial sums of 0/1 flags), no
    per-rule scans, no Expand."""
    aggs = []
    for c in spec.columns:
        pred = c.violation_predicate(F.col(c.name))
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(f"v_{c.name}")
        )
    aggs.append(F.count(F.lit(1)).alias("n_checked"))
    one = df.agg(*aggs)
    stack = ", ".join(f"'{c.name}', v_{c.name}, n_checked" for c in spec.columns)
    return one.selectExpr(
        f"stack({len(spec.columns)}, {stack}) AS (col_name, n_violations, n_checked)"
    )


class MetadataClient(Protocol):
    """The injected seam to whatever holds table metadata (a REST
    metadata API in the reference; a metastore or catalog elsewhere).
    All methods are idempotent — the lifecycle retries them."""

    def create_table(self, spec: TableSpec) -> None: ...

    def create_alternate_key(self, table: str, key_cols: tuple[str, ...]) -> None: ...

    def key_status(self, table: str) -> str:  # 'Pending' | 'Active' | 'Failed'
        ...

    def publish(self, table: str) -> None: ...


class TableLifecycle:
    """create → alternate key → poll-until-active → publish.

    The reference runs these as four manual scripts with a human
    checking status in between; here it is one ordered, idempotent
    workflow. The key index build is asynchronous server-side
    (``check_alternate_key_status.py`` exists precisely because of
    that), so the lifecycle polls with a deadline instead of assuming
    readiness."""

    def __init__(
        self,
        client: MetadataClient,
        poll_interval: float = 2.0,
        timeout: float = 300.0,
        sleep=time.sleep,
    ) -> None:
        self.client = client
        self.poll_interval = poll_interval
        self.timeout = timeout
        self._sleep = sleep

    def provision(self, spec: TableSpec) -> dict:
        self.client.create_table(spec)
        steps = ["create_table"]
        if spec.alternate_key:
            self.client.create_alternate_key(spec.name, spec.alternate_key)
            steps.append("create_alternate_key")
            waited = 0.0
            while True:
                status = self.client.key_status(spec.name)
                if status == "Active":
                    break
                if status == "Failed":
                    raise RuntimeError(f"alternate key build failed for {spec.name}")
                if waited >= self.timeout:
                    raise TimeoutError(
                        f"alternate key on {spec.name} not active after {self.timeout}s"
                    )
                self._sleep(self.poll_interval)
                waited += self.poll_interval
            steps.append("key_active")
        self.client.publish(spec.name)
        steps.append("publish")
        return {"table": spec.name, "steps": steps}
