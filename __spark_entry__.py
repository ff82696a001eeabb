"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's operator registry
(bw_new_data_integration_spark/queries/) for the DuckDB-oracle
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bw_new_data_integration_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1 pricing summary) on /root/testdata/sf0.001."""
    return _q.a1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.registry()


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query; omitted entries get the weaker
    rows-only check."""
    return _q.oracles()
