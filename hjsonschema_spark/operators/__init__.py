from hjsonschema_spark.operators import dedup, drift, similarity, text  # noqa: F401
