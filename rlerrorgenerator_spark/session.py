"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down by env for the
local[$SPARK_GRAFT_CPUS] sandbox:

- AQE on (runtime coalesce, skew-join splitting) — the reference has no
  execution layer at all (single-threaded eager R); we lean on Catalyst.
- Arrow on for every pandas UDF / applyInPandas exchange.
- shuffle partitions sized to cores locally; on a real cluster this would
  be ~2-3x total executor cores (or left to AQE's coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rlerrorgenerator-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (sandbox contract) or all
    local cores. On a real cluster ``master`` comes from spark-submit and
    the ``local[...]`` setting is ignored.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # 4x cores (the classic 2-4x rule): with partitions == cores one
        # straggler partition gates every stage (measured: the pair-score
        # stage dropped 34s -> 18s at 8 cores going 8 -> 32 partitions);
        # AQE coalesces the excess when partitions come out small.
        shuffle_partitions = max(4 * cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's 64MB default advisory size coalesces the ~100-200MB
        # mid-pipeline shuffles (pair tables, band keys) down to 2-3
        # tasks — starving every core past the second while leaving a
        # single-core run unaffected (wave quantization: a 3-task stage
        # uses 3 of 4 cores, then 0). 16MB keeps ≥3×cores tasks in
        # flight at sandbox scale; at 100 TB shuffles are far above
        # either value and the advisory is moot.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "16m"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # 4MB: true dims (nation/region, lookup tables, hot-key lists)
        # still broadcast — several are F.broadcast()-hinted anyway — but
        # mid-size fact-ish sides (pair attributes, band keys) go shuffle.
        # At 100 TB those sides could never be broadcast, so this keeps
        # sandbox plans identical in SHAPE to the scale plans, and avoids
        # serial driver-side builds of 100MB+ hashed relations that capped
        # measured scaling.
        .config("spark.sql.autoBroadcastJoinThreshold", str(4 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # keep stdout/stderr parseable: the driver tails bench/entry
        # output for a JSON line, and local-mode progress bars flooded
        # the round-3 tail (BENCH_r03 rc=124 recorded only bars)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
