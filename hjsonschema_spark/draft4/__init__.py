from hjsonschema_spark.draft4.validator import (  # noqa: F401
    Draft4Validator,
    Failure,
    SchemaInvalid,
    loads_json,
)
