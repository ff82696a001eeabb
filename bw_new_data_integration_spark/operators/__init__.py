from bw_new_data_integration_spark.operators import (  # noqa: F401
    aggregate,
    dedup,
    merge,
    multimodal,
    similarity,
    window_ops,
)
