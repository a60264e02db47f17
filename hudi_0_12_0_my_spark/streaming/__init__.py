"""Structured Streaming integration (SURVEY.md §2.2 streaming source/sink,
§2.9 fork additions: Kafka-JSON CDC, config-driven schemas, multi-table)."""

from .async_services import AsyncTableServices
from .ingest import (TableStreamConfig, load_stream_configs, schema_from_fields,
                     start_multi_table_ingest, start_table_stream)
from .dedup import streaming_exact_dedup
from .sessions import streaming_sessionize, windowed_sessions
from .sink import stream_write
from .source import HudiStreamDataSource, register_stream_source

__all__ = [
    "AsyncTableServices",
    "stream_write", "HudiStreamDataSource", "register_stream_source",
    "TableStreamConfig", "load_stream_configs", "schema_from_fields",
    "start_table_stream", "start_multi_table_ingest",
    "streaming_sessionize", "windowed_sessions", "streaming_exact_dedup",
]
