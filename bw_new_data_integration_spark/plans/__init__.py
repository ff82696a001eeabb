from bw_new_data_integration_spark.plans import pipeline, slicers  # noqa: F401
