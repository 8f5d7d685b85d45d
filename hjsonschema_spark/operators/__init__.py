from hjsonschema_spark.operators import (  # noqa: F401
    dedup,
    drift,
    pipeline,
    similarity,
    text,
)
