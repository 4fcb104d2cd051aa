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
