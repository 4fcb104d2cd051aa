"""Distributed global ranking (zipWithIndex pattern).

A bare ``Window.orderBy(...)`` with no partition key computes the entire
ranking in ONE task — the serial bottleneck class the round-1 review
flagged in SNM blocking, the hard-negative cap, and the metric scans.
This helper is the shared scale-safe replacement: range-partition on the
sort key, rank within each partition, add per-partition offsets (a tiny
driver-side cumulative sum over ≤ npart counts).

The rank is exact and partitioning-independent PROVIDED the sort key
tuple is a total order over rows (pass a tie-breaker column such as a
row id or hash as the last key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list[Column | str],
                out_col: str = "rn", npart: int | None = None) -> DataFrame:
    """Append 1-based global rank ``out_col`` ordered by ``order_cols``.

    Two jobs: one to materialize the range-partitioned ranking (the
    partition offsets must describe the exact same range boundaries the
    ranked rows carry — re-evaluating the plan could resample
    RangePartitioner bounds), one tiny count-per-partition collect.
    """
    if npart is None:
        npart = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    parted = (
        df.repartitionByRange(npart, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    wp = Window.partitionBy("__pid").orderBy(*order_cols)
    local = parted.withColumn("__rn_local", F.row_number().over(wp)) \
                  .localCheckpoint(eager=True)
    sizes = sorted(
        (r["__pid"], r["cnt"])
        for r in local.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in sizes:
        offsets.append((pid, acc))
        acc += cnt
    # explicit schema: with zero input rows `offsets` is empty and schema
    # inference over [] raises — the empty frame must still join cleanly
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.col("__rn_local") + F.col("__off"))
        .drop("__pid", "__rn_local", "__off")
    )
