from bw_new_data_integration_spark.streaming import incremental, stream  # noqa: F401
