from giranking_spark.streaming.ops import (
    read_documents_stream,
    read_edge_text_stream,
    read_events_stream,
    run_to_table,
    stream_dedup,
    stream_rank_refresh,
    stream_session_window,
    stream_sliding_window,
    stream_static_enrich,
    stream_stream_join,
    stream_user_state,
    stream_window_agg,
)

__all__ = [
    "read_documents_stream",
    "read_edge_text_stream",
    "read_events_stream",
    "run_to_table",
    "stream_dedup",
    "stream_rank_refresh",
    "stream_session_window",
    "stream_sliding_window",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_user_state",
    "stream_window_agg",
]
