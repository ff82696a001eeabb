"""Table catalog over the parquet test fixtures.

The reference's "catalog" is an SSAS cube catalog name per pipeline
(``pipelines/pipelines.yaml`` in the reference); here a catalog is a
directory of parquet tables. At scale this would be an external
metastore / Delta catalog; the API is the same either way:
``load(spark, sf_dir, "lineitem")``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Columnar scan with predicate pushdown + pruning.

    ``events.ts`` has shipped in two physical encodings across fixture
    generations: nanosecond int64 (which Spark's parquet reader rejects
    unless read as long) and plain microsecond timestamp. Normalize
    both to a microsecond-precision timestamp so every downstream plan
    sees one schema. The nanos path uses *integer* division (a double
    division would lose precision at 1e18 nanos); a DuckDB oracle
    mirrors the truncation with ``ts::TIMESTAMP``.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(df.schema["ts"].dataType, T.TimestampType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (hash-clustered) catalog table — the
    co-located-join layout for recurring fact-fact joins at 100 TB.

    Every file holds exactly one hash bucket of ``bucket_cols``; two
    tables bucketed the same way join with ZERO shuffle on either side
    (Catalyst's output-partitioning matching elides both Exchanges —
    pinned by
    ``tests/test_invariants.py::test_bucketed_join_avoids_shuffle``).
    A nightly fact-to-fact merge over 100 TB saves the two dominant
    wide shuffles this way; the bucket count is chosen once (rows per
    bucket ≈ executor-memory-sized) and becomes the join parallelism.
    ``sort_cols`` additionally sorts within buckets (sort-merge join
    without the sort step; parquet min/max stays selective on the key).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        # external table at an explicit location: a managed table's
        # warehouse directory outlives the session catalog, so a fresh
        # session hits LOCATION_ALREADY_EXISTS on re-create; callers
        # that re-register per run (gates, tests) pass a unique path
        # and drop any stale catalog entry first
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)
