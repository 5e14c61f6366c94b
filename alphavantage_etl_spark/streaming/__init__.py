from .pipeline import (
    attribution_join_stream,
    curation_ingest_stream,
    idempotent_sink_stream,
    incremental_append_stream,
    read_documents_stream,
    read_events_stream,
    run_stream_to_memory,
    running_bars_stream,
    sessionize_stream,
    windowed_counts_stream,
)

__all__ = [
    "attribution_join_stream",
    "curation_ingest_stream",
    "idempotent_sink_stream",
    "incremental_append_stream",
    "read_documents_stream",
    "read_events_stream",
    "run_stream_to_memory",
    "running_bars_stream",
    "sessionize_stream",
    "windowed_counts_stream",
]
