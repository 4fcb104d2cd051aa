"""Evaluation: pairwise classification metrics over labeled pairs.

Reference: ``calculate_metrics_prob``
(`/root/reference/benchmarking/utils.R:1005-1047`) — accuracy, precision,
recall, specificity, NPV, F1, classification error, Brier; review-percent
at PPV/NPV targets (`:1050-1081`); threshold search (`:1121-1160`).
All are single groupBy aggregations over the scored-pairs table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_pairs(scored: DataFrame, dirty: DataFrame) -> DataFrame:
    """Attach ground-truth labels from injection lineage: a pair is a true
    match iff the dirty row's ``orig_url`` equals the clean row's url
    (reference analogue: shared voter_reg_num, `utils.R:521-530`)."""
    truth = dirty.select(F.col("rid").alias("rid_b"), F.col("orig_url"))
    return scored.join(truth, "rid_b", "left").withColumn(
        "label", (F.col("orig_url") == F.col("rid_a")).cast("boolean")
    ).drop("orig_url")


def pairwise_metrics(labeled: DataFrame, prob_col: str = "match_prob",
                     threshold: float = 0.5) -> DataFrame:
    """One-row DataFrame of tp/fp/fn/tn, precision, recall, f1, accuracy,
    brier (`utils.R:1005-1047`)."""
    pred = F.col(prob_col) > threshold
    lab = F.col("label")
    clipped = F.least(F.greatest(F.col(prob_col), F.lit(0.0)), F.lit(1.0))
    agg = labeled.agg(
        F.sum((pred & lab).cast("long")).alias("tp"),
        F.sum((pred & ~lab).cast("long")).alias("fp"),
        F.sum((~pred & lab).cast("long")).alias("fn"),
        F.sum((~pred & ~lab).cast("long")).alias("tn"),
        F.avg(F.pow(clipped - lab.cast("double"), 2)).alias("brier"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    p = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return agg.select(
        "tp", "fp", "fn", "tn", "n_pairs", "brier",
        p.alias("precision"),
        r.alias("recall"),
        (2 * p * r / F.greatest(p + r, F.lit(1e-12))).alias("f1"),
        ((F.col("tp") + F.col("tn"))
         / F.greatest(F.col("tp") + F.col("tn") + F.col("fp") + F.col("fn"), F.lit(1))
         ).alias("accuracy"),
    )


def per_partition_metrics(labeled: DataFrame, prob_col: str = "match_prob",
                          threshold: float = 0.5) -> DataFrame:
    """Per-partition tp/fp/fn + match rate — the north rule's
    per-partition metrics checkpoint payload."""
    pred = F.col(prob_col) > threshold
    lab = F.col("label")
    return (
        labeled.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.sum((pred & lab).cast("long")).alias("tp"),
            F.sum((pred & ~lab).cast("long")).alias("fp"),
            F.sum((~pred & lab).cast("long")).alias("fn"),
            F.avg(pred.cast("double")).alias("match_rate"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


def calc_review_pct(labeled: DataFrame, ppv_target: float = 0.95,
                    npv_target: float = 0.95,
                    prob_col: str = "match_prob") -> DataFrame:
    """Fraction of pairs needing clerical review at PPV/NPV targets
    (`/root/reference/benchmarking/utils.R:1050-1081`): find the lowest
    upper threshold whose accept-set precision ≥ ppv_target and the
    highest lower threshold whose reject-set NPV ≥ npv_target; pairs with
    probability between the two need human review.

    One pass: rank pairs by prob desc (accept side) / asc (reject side),
    cumulative precision/NPV via windows, pick the qualifying bounds.
    """
    from pyspark.sql import Window

    total = labeled.count()
    wd = Window.orderBy(F.desc(prob_col))
    acc = (
        labeled.select(prob_col, F.col("label").cast("long").alias("y"))
        .withColumn("ctp", F.sum("y").over(wd))
        .withColumn("cn", F.count(F.lit(1)).over(wd))
        .withColumn("ppv", F.col("ctp") / F.col("cn"))
    )
    upper_row = acc.where(F.col("ppv") >= ppv_target).agg(
        F.min(prob_col).alias("t")
    ).collect()[0]
    upper = upper_row["t"] if upper_row["t"] is not None else 1.0
    wa = Window.orderBy(F.asc(prob_col))
    rej = (
        labeled.select(prob_col, (~F.col("label")).cast("long").alias("yn"))
        .withColumn("ctn", F.sum("yn").over(wa))
        .withColumn("cn", F.count(F.lit(1)).over(wa))
        .withColumn("npv", F.col("ctn") / F.col("cn"))
    )
    lower_row = rej.where(F.col("npv") >= npv_target).agg(
        F.max(prob_col).alias("t")
    ).collect()[0]
    lower = lower_row["t"] if lower_row["t"] is not None else 0.0
    n_review = labeled.where(
        (F.col(prob_col) > lower) & (F.col(prob_col) < upper)
    ).count()
    spark = labeled.sparkSession
    return spark.createDataFrame(
        [(float(lower), float(upper), n_review, total,
          n_review / max(total, 1))],
        ["lower_threshold", "upper_threshold", "n_review", "n_pairs", "review_pct"],
    )


def sample_strat(labeled: DataFrame, n: int, match_frac: float = 0.2,
                 seed: int = 42, label_col: str = "label") -> DataFrame:
    """Stratified sample: ``n`` pairs at ``match_frac`` positives
    (`paper_flow_dob_latest.Rmd:161-172` ``sample_strat``). Deterministic
    seeded top-k per stratum (not ``sampleBy`` — that's Bernoulli and
    non-exact)."""
    from pyspark.sql import Window

    n_pos = int(n * match_frac)
    w = Window.partitionBy(label_col).orderBy(
        F.xxhash64(F.lit(seed), F.col("rid_a"), F.col("rid_b"))
    )
    ranked = labeled.withColumn("__rk", F.row_number().over(w))
    return ranked.where(
        (F.col(label_col) & (F.col("__rk") <= n_pos))
        | (~F.col(label_col) & (F.col("__rk") <= n - n_pos))
    ).drop("__rk")


def find_threshold_for_metric(labeled: DataFrame, metric: str = "precision",
                              target: float = 0.99,
                              prob_col: str = "match_prob") -> float | None:
    """Lowest threshold achieving ``metric ≥ target``
    (`utils.R:1121-1160`) — computed in one pass: sort unique probs desc,
    cumulative tp/fp via window, pick the smallest qualifying threshold."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(prob_col))
    cum = (
        labeled.select(prob_col, F.col("label").cast("long").alias("y"))
        .withColumn("ctp", F.sum("y").over(w))
        .withColumn("cn", F.count(F.lit(1)).over(w))
    )
    total_pos = labeled.where("label").count()
    cum = cum.withColumn("precision", F.col("ctp") / F.col("cn")).withColumn(
        "recall", F.col("ctp") / F.lit(max(total_pos, 1))
    )
    ok = cum.where(F.col(metric) >= target).agg(F.min(prob_col).alias("t")).collect()
    return ok[0]["t"] if ok else None
