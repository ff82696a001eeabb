"""bw_new_data_integration_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference system
PTPSystem/BW-New-Data-Integration (a config-driven OLAP→Dataverse batch
integration engine), re-expressed Spark-first:

- the cube's aggregation semantics become ``groupBy().agg()`` plans
  (SURVEY.md §2.4),
- the YAML pipeline/mapping surface compiles to Catalyst expressions
  (SURVEY.md §1.4),
- the keyed-upsert sink becomes a deterministic DataFrame merge
  (SURVEY.md §2.5 J4, §2.8 K1),
- plus the large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) the reference never had.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from bw_new_data_integration_spark.session import get_spark  # noqa: F401
