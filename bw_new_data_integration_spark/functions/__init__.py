from bw_new_data_integration_spark.functions import coercion, keys, text, vectors  # noqa: F401
