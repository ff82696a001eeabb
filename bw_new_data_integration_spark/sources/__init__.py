from bw_new_data_integration_spark.sources import files, odata, parquet_target, xmla  # noqa: F401
