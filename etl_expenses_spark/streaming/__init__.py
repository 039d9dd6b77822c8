from etl_expenses_spark.streaming.pipeline import (  # noqa: F401
    run_events_stream_once,
    stream_sessionized_values,
    stream_windowed_counts,
)
