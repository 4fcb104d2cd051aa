"""Streaming ingest tests (availableNow incremental-batch semantics)."""

from __future__ import annotations

import os

from rlerrorgenerator_spark.sources.pages import synth_pages
from rlerrorgenerator_spark.streaming.ingest import (
    host_window_counts,
    run_available_now,
    stream_dedup_pages,
    stream_pages,
)


def test_stream_dedup_and_windows(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    pages = synth_pages(spark, 200, seed=5)
    # write twice → every url duplicated across two files
    pages.write.mode("overwrite").parquet(src)
    pages.write.mode("append").parquet(src)

    stream = stream_pages(spark, src)
    assert stream.isStreaming
    run_available_now(stream_dedup_pages(stream), out, ck)
    got = spark.read.parquet(out)
    assert got.count() == 200  # exact dups collapsed
    assert got.select("url").distinct().count() == 200

    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    run_available_now(host_window_counts(stream_pages(spark, src)), out2, ck2)
    win = spark.read.parquet(out2)
    assert win.count() > 0
    cols = set(win.columns)
    assert {"window_start", "window_end", "host", "n_pages"} <= cols

    # resume: nothing new to process → no new rows appended
    n_before = spark.read.parquet(out).count()
    run_available_now(stream_dedup_pages(stream_pages(spark, src)), out, ck)
    assert spark.read.parquet(out).count() == n_before
