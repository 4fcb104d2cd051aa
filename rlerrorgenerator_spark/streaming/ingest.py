"""Streaming pages ingest: watermarked dedup + windowed crawl metrics.

Design notes for the 100 TB deployment:

- source: a file/Kafka stream of WARC-derived page records with the
  standard pages schema; here ``readStream.schema(...).parquet(dir)``.
- dedup: ``dropDuplicatesWithinWatermark`` on (url, fingerprint) bounds
  state by the watermark horizon — unbounded ``dropDuplicates`` would
  grow state forever at crawl scale.
- metrics: tumbling-window counts per host with a watermark so late
  arrivals within the horizon still count and state is evicted after.
- sink: ``availableNow`` trigger gives incremental batch runs (the
  resumable-checkpoint discipline of the rest of the engine; checkpoint
  location = streaming state + exactly-once file sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlerrorgenerator_spark.sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of pages parquet drops."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def stream_dedup_pages(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on (url, text-fingerprint) within the
    watermark horizon — state-bounded."""
    with_fp = pages.withColumn(
        "fp", F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    )
    return (
        with_fp.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url", "fp"])
    )


def host_window_counts(pages: DataFrame, window: str = "10 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Tumbling-window page counts per host (crawl-rate metrics)."""
    host = F.regexp_extract("url", r"^[a-z0-9]+://(?:www\.)?([^/]+)", 1)
    return (
        pages.withColumn("host", host)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "n_pages",
        )
    )


def run_available_now(stream_df: DataFrame, out_dir: str, ckpt_dir: str,
                      output_mode: str = "append") -> None:
    """Drain everything currently available into a parquet sink, then stop
    (incremental batch semantics; re-runs resume from the checkpoint)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def crawl_sessionize(pages: DataFrame, gap: str = "30 minutes",
                     watermark: str = "2 hours") -> DataFrame:
    """Custom STATEFUL operator: per-host crawl sessionization via
    ``applyInPandasWithState`` — the north star's "custom stateful
    streaming operator" shape. A session is a run of fetches from one
    host with gaps under ``gap``; emits one row per CLOSED session
    (host, session_start, session_end, n_pages). State per host is a
    constant-size tuple (start, last_ts, count) and is dropped on
    timeout — bounded regardless of stream length.
    """
    import datetime as _dt
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    gap_ms = _parse_duration_ms(gap)
    out_schema = T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_pages", T.LongType()),
    ])
    state_schema = "start long, last long, n long"

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        (host,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame({
                "host": [host],
                "session_start": [pd.Timestamp(start, unit="ms")],
                "session_end": [pd.Timestamp(last, unit="ms")],
                "n_pages": [n],
            })
            return
        cur = state.get if state.exists else None
        # A group's micro-batch rows arrive as MULTIPLE Arrow chunks in
        # arbitrary order; sorting per chunk is not enough — a later chunk
        # holding earlier timestamps would produce a negative gap and merge
        # sessions that should split. Accumulate every chunk first, sort
        # once globally, then run the gap-split scan.
        all_ts: list[int] = []
        for b in batches:
            all_ts.extend(int(t.value // 10**6) for t in pd.to_datetime(b["warc_ts"]))
        closed, cur = _gap_split(all_ts, cur, gap_ms)
        if cur is not None:
            state.update(cur)
            state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame({
                "host": [host] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="ms") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="ms") for c in closed],
                "n_pages": [c[2] for c in closed],
            })

    host = F.regexp_extract("url", r"^[a-z0-9]+://(?:www\.)?([^/]+)", 1)
    return (
        pages.withColumn("host", host)
        .withWatermark("warc_ts", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            fn, outputStructType=out_schema, stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def _gap_split(ts_ms: list[int], cur: tuple[int, int, int] | None,
               gap_ms: int) -> tuple[list[tuple[int, int, int]],
                                     tuple[int, int, int] | None]:
    """Gap-based session split over a (possibly unsorted) timestamp list.

    Sorts ONCE globally — the result is independent of the order chunks
    delivered the timestamps in. Returns (closed_sessions, open_session),
    each session a (start_ms, last_ms, count) tuple."""
    closed: list[tuple[int, int, int]] = []
    for t in sorted(ts_ms):
        if cur is None:
            cur = (t, t, 1)
        elif t - cur[1] <= gap_ms:
            cur = (cur[0], max(cur[1], t), cur[2] + 1)
        else:
            closed.append(cur)
            cur = (t, t, 1)
    return closed, cur


def _parse_duration_ms(text: str) -> int:
    n, unit = text.split()
    mult = {"second": 1000, "seconds": 1000, "minute": 60000,
            "minutes": 60000, "hour": 3600000, "hours": 3600000}[unit]
    return int(n) * mult
