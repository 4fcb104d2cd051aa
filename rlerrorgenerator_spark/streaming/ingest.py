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


def sessionize_stream(df: DataFrame, key_col: str, ts_col: str,
                      gap: str = "30 minutes",
                      watermark: str | None = "2 hours",
                      count_col: str = "n_events",
                      idle_timeout: bool = True) -> DataFrame:
    """Custom STATEFUL operator: gap-based sessionization per ``key_col``
    via ``applyInPandasWithState`` — the north star's "custom stateful
    streaming operator" shape. A session is a run of rows for one key
    with inter-arrival gaps under ``gap``; emits one row per CLOSED
    session (key, session_start, session_end, count). State per key is a
    constant-size tuple (start, last_ts, count) and is dropped on
    timeout — bounded regardless of stream length.

    Timestamps are handled at MICROSECOND precision end-to-end so the
    gap comparisons match an engine computing on the raw timestamps
    (the DuckDB oracle for the driver query does exactly that).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    gap_us = _parse_duration_ms(gap) * 1000
    key_field = df.schema[key_col]
    # session bounds keep the INPUT timestamp type (TIMESTAMP vs
    # TIMESTAMP_NTZ) — the µs ints round-trip as wall-clock either way
    ts_type = df.schema[ts_col].dataType
    out_schema = T.StructType([
        T.StructField(key_col, key_field.dataType),
        T.StructField("session_start", ts_type),
        T.StructField("session_end", ts_type),
        T.StructField(count_col, T.LongType()),
    ])
    state_schema = "start long, last long, n long"

    def _emit(key_val, sessions):
        return pd.DataFrame({
            key_col: [key_val] * len(sessions),
            "session_start": [pd.Timestamp(c[0], unit="us") for c in sessions],
            "session_end": [pd.Timestamp(c[1], unit="us") for c in sessions],
            count_col: [c[2] for c in sessions],
        })

    def fn(key, batches: Iterator[pd.DataFrame], state: GroupState):
        (key_val,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _emit(key_val, [(start, last, n)])
            return
        cur = state.get if state.exists else None
        # A group's micro-batch rows arrive as MULTIPLE Arrow chunks in
        # arbitrary order; sorting per chunk is not enough — a later chunk
        # holding earlier timestamps would produce a negative gap and merge
        # sessions that should split. Accumulate every chunk first, sort
        # once globally, then run the gap-split scan.
        all_ts: list[int] = []
        for b in batches:
            all_ts.extend(int(t.value // 10**3) for t in pd.to_datetime(b[ts_col]))
        closed, cur = _gap_split(all_ts, cur, gap_us)
        if cur is not None:
            state.update(cur)
            if idle_timeout:
                state.setTimeoutDuration(gap_us // 1000)
        if closed:
            yield _emit(key_val, closed)

    # watermark is optional: ProcessingTimeTimeout does not need one, and
    # TIMESTAMP_NTZ event-time columns cannot carry a watermark at all.
    # idle_timeout=False (NoTimeout) is for drain-to-completion runs: with
    # ProcessingTimeTimeout pending, an availableNow trigger keeps running
    # empty "cleaning up state" micro-batches until wall-clock timeouts
    # fire; with NoTimeout the drain terminates after the data batches and
    # open sessions honestly remain in state (never emitted).
    wm = df.withWatermark(ts_col, watermark) if watermark else df
    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout if idle_timeout
                    else GroupStateTimeout.NoTimeout)
    return (
        wm.groupBy(key_col)
        .applyInPandasWithState(
            fn, outputStructType=out_schema, stateStructType=state_schema,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


def crawl_sessionize(pages: DataFrame, gap: str = "30 minutes",
                     watermark: str = "2 hours") -> DataFrame:
    """Per-host crawl sessionization (host derived from the url), one row
    per closed session: (host, session_start, session_end, n_pages)."""
    host = F.regexp_extract("url", r"^[a-z0-9]+://(?:www\.)?([^/]+)", 1)
    return sessionize_stream(
        pages.withColumn("host", host).select("host", "warc_ts"),
        key_col="host", ts_col="warc_ts", gap=gap, watermark=watermark,
        count_col="n_pages",
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
