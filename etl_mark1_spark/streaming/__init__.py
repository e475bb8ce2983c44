from etl_mark1_spark.streaming.events import (  # noqa: F401
    hourly_event_aggregate,
    read_events_stream,
    run_available_now,
    sessionize,
)
