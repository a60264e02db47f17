"""Ingestion sources + transformers (DeltaStreamer parity, SURVEY.md §2.8)."""

from .readers import (hive_incr_pull_source, read_source,
                      s3_events_incr_source)
from .transform import (chain_transformers, flatten_transformer,
                        sql_file_transformer, sql_query_transformer)

__all__ = ["read_source", "s3_events_incr_source", "hive_incr_pull_source",
           "sql_query_transformer", "sql_file_transformer",
           "flatten_transformer", "chain_transformers"]
