from hjsonschema_spark.streaming.incremental import validate_stream  # noqa: F401
