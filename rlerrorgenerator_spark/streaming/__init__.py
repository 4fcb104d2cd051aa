"""Structured Streaming ingest for the pages table.

The reference is pure batch R (SURVEY.md §2.9: no streaming constructs),
and the north rule is batch too — this module is the engine's ingest
surface for continuously-arriving crawl data: the same pages schema,
watermarked streaming dedup and windowed per-host metrics, runnable
incrementally (``availableNow``) or continuously.
"""

from rlerrorgenerator_spark.streaming.ingest import (
    host_window_counts,
    stream_dedup_pages,
    stream_pages,
)

__all__ = ["stream_pages", "stream_dedup_pages", "host_window_counts"]
