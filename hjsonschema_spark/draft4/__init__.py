from hjsonschema_spark.draft4.validator import (  # noqa: F401
    Draft4Validator,
    Failure,
    SchemaInvalid,
    loads_json,
)
from hjsonschema_spark.draft4.fetch import (  # noqa: F401
    FetchFailure,
    fetch_and_validate,
    fetch_refs,
    filesystem_fetcher,
    http_fetcher,
)
