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


def test_crawl_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions split on gaps > gap;
    counts and bounds correct (availableNow drain)."""
    import datetime as dt

    from rlerrorgenerator_spark.sources.pages import PAGES_SCHEMA
    from rlerrorgenerator_spark.streaming.ingest import (
        crawl_sessionize,
        stream_pages,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # host A: 3 fetches in one session, then a 2h gap, then 2 more
    for i, mins in enumerate((0, 5, 10, 130, 135)):
        rows.append((f"https://www.hosta.com/p/{i}", base + dt.timedelta(minutes=mins),
                     bytearray(b"<html><body><p>x</p></body></html>"), "x", "en"))
    # host B: single fetch
    rows.append(("https://www.hostb.com/p/0", base, bytearray(b"<html></html>"), "", "en"))
    df = spark.createDataFrame(rows, PAGES_SCHEMA)
    src = str(tmp_path / "in")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    sessions = crawl_sessionize(stream_pages(spark, src), gap="30 minutes")
    q = (
        sessions.writeStream.format("memory").queryName("sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    # Do NOT awaitTermination(): with ProcessingTimeTimeout the
    # availableNow drain keeps scheduling no-data micro-batches until the
    # pending open-session timeouts (gap = 30 min!) fire. The session we
    # assert on is CLOSED by a later fetch and emitted in the first data
    # batch — poll for it, then stop the query.
    import time

    deadline = time.time() + 180
    got: set = set()
    while time.time() < deadline:
        got = {(r.host, r.n_pages) for r in spark.sql("select * from sess").collect()}
        if ("hosta.com", 3) in got:
            break
        time.sleep(2)
    q.stop()
    # host A's first session closed when the 130-minute fetch arrived
    assert ("hosta.com", 3) in got


def test_gap_split_chunk_order_independent():
    """The sessionizer's scan must not depend on the order Arrow chunks
    deliver a group's rows: a later chunk holding earlier timestamps
    previously produced negative gaps that merged separate sessions."""
    from rlerrorgenerator_spark.streaming.ingest import _gap_split

    gap = 30 * 60000
    # two sessions: [0, 5, 10] min and [130, 135] min
    mins = [0, 5, 10, 130, 135]
    ts = [m * 60000 for m in mins]
    want_closed, want_open = _gap_split(ts, None, gap)
    assert [c[2] for c in want_closed] == [3]
    assert want_open[2] == 2
    # adversarial delivery: the "later" chunk arrives first
    shuffled = [m * 60000 for m in (130, 135, 0, 5, 10)]
    got_closed, got_open = _gap_split(shuffled, None, gap)
    assert (got_closed, got_open) == (want_closed, want_open)
