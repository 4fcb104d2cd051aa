"""Statistical helpers: group-count features + z-scaling.

Reference: ``add_count_name`` (`/root/reference/benchmarking/utils.R:407-424`)
appends the per-value frequency of a column to every row (name frequency
features ffreq/lfreq) and z-scales it (`utils.R:68-69,196-213`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_count(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """Append the group size of ``col``'s value to every row — a count
    window over the value (one shuffle, map-side combinable via the
    window exchange)."""
    out_col = out_col or f"{col}_n"
    w = Window.partitionBy(col)
    return df.withColumn(out_col, F.count("*").over(w).cast("double"))


def z_scale(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """(x − mean)/stddev via a single global aggregate broadcast back
    (crossjoin of a 1-row aggregate — Catalyst broadcasts it)."""
    out_col = out_col or f"{col}_z"
    stats = df.agg(
        F.avg(col).alias("__mu"), F.stddev_samp(col).alias("__sd")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            out_col,
            F.when(F.col("__sd") > 0, (F.col(col) - F.col("__mu")) / F.col("__sd"))
            .otherwise(F.lit(0.0)),
        )
        .drop("__mu", "__sd")
    )


def add_count_name(df: DataFrame, col: str) -> DataFrame:
    """Reference-shaped: frequency of the value + z-scaled variant
    (``ffreq``/``lfreq`` features, `utils.R:407-424`)."""
    counted = add_count(df, col, f"{col}_freq")
    return z_scale(counted, f"{col}_freq", f"{col}_freq_z")
