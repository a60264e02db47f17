"""Streaming exact dedup: drop content-duplicate documents as they arrive.

The streaming analogue of operators/dedup.exact_dedup: each row's content
hash (128-bit md5 of normalized text, same normalization as the batch
operator) keys `dropDuplicatesWithinWatermark`, so a duplicate arriving
within the event-time watermark of its first occurrence is suppressed and
state for old hashes is evicted once the watermark passes — bounded state,
exactly the semantics a continuous ingestion pipeline needs (a re-crawled
page deduplicates against the recent stream, not all of history; pair with
the batch operator for full-corpus passes).

Scale shape: ONE shuffle per micro-batch on the uniformly-distributed
content hash (the state-store partitioning), state size O(distinct recent
hashes), nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          ts_col: str = "ts",
                          watermark: str = "10 minutes",
                          normalize: bool = True) -> DataFrame:
    """Emit only the first occurrence of each content hash within the
    watermark window. Adds `content_hash`; requires an event-time column."""
    c = F.col(text_col)
    if normalize:
        c = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return (stream
            .withColumn("content_hash", F.md5(c.cast("binary")))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))
