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
