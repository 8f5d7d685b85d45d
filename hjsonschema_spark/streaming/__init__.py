from hjsonschema_spark.streaming.incremental import validate_stream  # noqa: F401
from hjsonschema_spark.streaming.stateful import (  # noqa: F401
    ordered_state_stream,
    run_ordered_state,
    score_drift_windows,
    session_window_stream,
    windowed_histogram_stream,
)
