"""Metrics-block completeness (AUC/Gini/specificity/NPV, grid, ROC) and
the bucketed cumulative scans — hand-computed small fixtures.

Reference: ``calculate_metrics_prob`` /root/reference/benchmarking/utils.R:1005-1047,
review grid :1050-1081, ROC :1163-1190.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def labeled(spark):
    # (prob, label): 4 positives, 4 negatives with one hard negative at 0.8
    rows = [
        (0.95, True), (0.9, True), (0.85, True), (0.6, True),
        (0.8, False), (0.4, False), (0.2, False), (0.1, False),
    ]
    return spark.createDataFrame(
        [(f"a{i}", f"b{i}", p, y) for i, (p, y) in enumerate(rows)],
        ["rid_a", "rid_b", "match_prob", "label"],
    )


def test_pairwise_metrics_block(labeled):
    from rlerrorgenerator_spark.linkage.metrics import pairwise_metrics

    m = pairwise_metrics(labeled, with_auc=True).collect()[0]
    # threshold 0.5: pred+ = {.95,.9,.85,.8,.6} → tp=4 fp=1 fn=0 tn=3
    assert (m.tp, m.fp, m.fn, m.tn) == (4, 1, 0, 3)
    assert m.precision == pytest.approx(0.8)
    assert m.recall == 1.0
    assert m.specificity == pytest.approx(3 / 4)
    assert m.npv == 1.0
    # AUC by hand: positive ranks (asc probs: .1 .2 .4 .6 .8 .85 .9 .95)
    # positives at ranks 4,6,7,8 → U = 25 − 10 = 15; AUC = 15/16
    assert m.auc == pytest.approx(15 / 16)
    assert m.gini == pytest.approx(2 * 15 / 16 - 1)


def test_auc_ties(spark):
    from rlerrorgenerator_spark.linkage.metrics import auc_metrics

    # all probabilities identical → AUC must be 0.5 (tie-corrected)
    df = spark.createDataFrame(
        [(str(i), 0.7, i % 2 == 0) for i in range(10)],
        ["rid_a", "match_prob", "label"],
    )
    m = auc_metrics(df).collect()[0]
    assert m.auc == pytest.approx(0.5)


def test_find_threshold_bucketed(labeled):
    from rlerrorgenerator_spark.linkage.metrics import find_threshold_for_metric

    # precision 1.0 requires excluding the 0.8 negative → threshold 0.85
    t = find_threshold_for_metric(labeled, "precision", 1.0)
    assert t == pytest.approx(0.85)
    # recall 1.0: highest qualifying threshold = lowest positive prob 0.6
    t = find_threshold_for_metric(labeled, "recall", 1.0)
    assert t == pytest.approx(0.6)
    assert find_threshold_for_metric(labeled, "precision", 0.999) == pytest.approx(0.85)


def test_review_grid_and_roc(labeled):
    from rlerrorgenerator_spark.linkage.metrics import review_pct_grid, roc_table

    grid = {r.target: r for r in review_pct_grid(labeled).collect()}
    assert set(grid) == {round(0.90 + 0.01 * i, 2) for i in range(11)}
    g1 = grid[1.0]
    # PPV=1.0 accept-set = {.95,.9,.85}; NPV=1.0 reject-set = {.1,.2,.4}
    assert (g1.n_accept, g1.n_reject, g1.n_review) == (3, 3, 2)
    assert g1.review_pct == pytest.approx(0.25)
    roc = {r.threshold: r for r in roc_table(labeled).collect()}
    assert roc[0.95].tpr == pytest.approx(0.25) and roc[0.95].fpr == 0.0
    assert roc[0.1].tpr == 1.0 and roc[0.1].fpr == 1.0
    assert roc[0.8].fpr == pytest.approx(0.25)


def test_review_threshold_summary(labeled):
    """Collect-free one-row form (utils.R:1050-1081,1121-1160): counts
    follow grid semantics, thresholds are the extreme qualifying bucket
    probabilities — hand-computed on the 8-pair fixture."""
    from rlerrorgenerator_spark.linkage.metrics import review_threshold_summary

    r = review_threshold_summary(labeled).collect()[0]
    # desc ppv curve: 1, 1, 1, .75, .8, … → qualifying {.95,.9,.85}
    assert r.review_upper == pytest.approx(0.85)
    assert r.n_accept == 3
    # asc npv curve: 1, 1, 1, .75, … → qualifying {.1,.2,.4}
    assert r.review_lower == pytest.approx(0.4)
    assert r.n_reject == 3
    assert r.n_review == 2
    assert r.review_pct == pytest.approx(0.25)
    # precision ≥ 0.99 first reached at 0.85 (excludes the 0.8 negative)
    assert r.thr_precision == pytest.approx(0.85)


def test_review_threshold_summary_degenerate(spark):
    """No qualifying buckets → sentinel thresholds (1.0/0.0) and a full
    review band; all-positive input → zero review."""
    from rlerrorgenerator_spark.linkage.metrics import review_threshold_summary

    # every bucket mixes labels 50/50 → ppv/npv never reach 0.95
    mixed = spark.createDataFrame(
        [(str(i), 0.5 + 0.001 * (i % 3), i % 2 == 0) for i in range(12)],
        ["rid_a", "match_prob", "label"],
    )
    r = review_threshold_summary(mixed).collect()[0]
    assert (r.review_upper, r.review_lower) == (1.0, 0.0)
    assert r.n_review == 12 and r.review_pct == pytest.approx(1.0)
    allpos = spark.createDataFrame(
        [(str(i), 0.9, True) for i in range(5)],
        ["rid_a", "match_prob", "label"],
    )
    r = review_threshold_summary(allpos).collect()[0]
    assert r.n_accept == 5 and r.n_review == 0


def test_no_global_window_over_pairs(labeled):
    """The cumulative scans must window over the bucketed prob table, not
    the raw pair table: distinct-prob cardinality bounds the single task."""
    from rlerrorgenerator_spark.linkage.metrics import _prob_buckets

    b = _prob_buckets(labeled, "match_prob")
    assert b.count() == 8  # one row per distinct prob, not per pair
    assert set(b.columns) == {"p", "n", "ny"}


def test_calibration_clamp_saturates(spark):
    """amount_mult scaling a fractional rate past 1.0 must hit ALL rows,
    not int(1.0)=1 row (round-1 advisory bug)."""
    from rlerrorgenerator_spark.operators import ErrorConfigRow, mess_data
    from rlerrorgenerator_spark.sources.pages import prep_pages, synth_pages

    clean = prep_pages(synth_pages(spark, 40, seed=7)).localCheckpoint(eager=True)
    cfg = [ErrorConfigRow("make_missing", 0.5, ["lang"])]
    dirty, lineage = mess_data(clean, cfg, seed=7, amount_mult=4.0)
    n_err = lineage.count()
    assert n_err == 40  # every row blanked, not 1
    assert dirty.where(F.col("lang").isNull()).count() == 40


def test_prob_buckets_bounded(spark):
    """Near-unique continuous probabilities (the logreg/MLP case) must
    still collapse to a BOUNDED bucket table — at the old 9-decimal
    default the bucket count was ~n_pairs and the bounded window
    degenerated to a single-task global sort."""
    from pyspark.sql import functions as F

    from rlerrorgenerator_spark.linkage.metrics import _prob_buckets, auc_metrics

    n = 20000
    df = (
        spark.range(n)
        .select(
            (F.col("id") / n + F.xxhash64("id") % 1000 / 1e9).alias("match_prob"),
            (F.col("id") % 3 == 0).alias("label"),
        )
    )
    n_buckets = _prob_buckets(df, "match_prob").count()
    assert n_buckets <= 100_001
    # quantization must not visibly move AUC: compare 5 vs 7 decimals
    a5 = auc_metrics(df).collect()[0]["auc"]
    a7_buckets = _prob_buckets(df, "match_prob", decimals=7)
    assert abs(a5 - _auc_from_buckets(a7_buckets)) < 1e-3


def _auc_from_buckets(per):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per.withColumn(
        "before", F.coalesce(F.sum("n").over(w), F.lit(0))
    ).withColumn("avg_rank", F.col("before") + (F.col("n") + 1) / 2.0)
    agg = ranked.agg(
        F.sum(F.col("ny") * F.col("avg_rank")).alias("rank_sum"),
        F.sum("ny").alias("npos"),
        F.sum(F.col("n") - F.col("ny")).alias("nneg"),
    ).collect()[0]
    return (agg["rank_sum"] - agg["npos"] * (agg["npos"] + 1) / 2.0) / max(
        agg["npos"] * agg["nneg"], 1
    )


def test_global_rank_empty_input(spark):
    from pyspark.sql import functions as F

    from rlerrorgenerator_spark.functions.rank import global_rank

    df = spark.range(10).select(F.col("id")).where(F.col("id") < 0)
    out = global_rank(df, ["id"], out_col="rn")
    assert out.count() == 0
    assert "rn" in out.columns
