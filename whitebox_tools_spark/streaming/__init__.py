from whitebox_tools_spark.streaming.pipeline import (
    run_available_now,
    stream_table,
    streaming_session_peaks,
    streaming_tile_assign,
    streaming_token_stats,
    streaming_window_counts,
)

__all__ = [
    "stream_table",
    "run_available_now",
    "streaming_tile_assign",
    "streaming_token_stats",
    "streaming_window_counts",
    "streaming_session_peaks",
]
