from .pipeline import (
    read_events_stream,
    windowed_counts_stream,
    sessionize_stream,
    incremental_append_stream,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream",
    "windowed_counts_stream",
    "sessionize_stream",
    "incremental_append_stream",
    "run_stream_to_memory",
]
