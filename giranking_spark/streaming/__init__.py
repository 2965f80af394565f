from giranking_spark.streaming.ops import (
    read_events_stream,
    run_to_table,
    stream_session_window,
    stream_user_state,
    stream_window_agg,
)

__all__ = [
    "read_events_stream",
    "run_to_table",
    "stream_session_window",
    "stream_user_state",
    "stream_window_agg",
]
