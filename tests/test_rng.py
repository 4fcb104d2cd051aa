"""Deterministic RNG discipline (SURVEY.md §4 custom component 2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from rlerrorgenerator_spark.rng import (
    bernoulli_col,
    hash64_py,
    hash64_series,
    rank_col,
    row_rng,
    uniform_series,
)


def test_hash64_stable():
    assert hash64_py("k", 1, "s") == hash64_py("k", 1, "s")
    assert hash64_py("k", 1, "s") != hash64_py("k", 2, "s")
    assert hash64_py("k", 1, "s") != hash64_py("k", 1, "t")


def test_hash64_series_matches_scalar():
    s = pd.Series(["a", "b", "c"])
    arr = hash64_series(s, 5, "st")
    assert [int(x) for x in arr] == [hash64_py(k, 5, "st") for k in s]


def test_row_rng_reproducible():
    assert row_rng("x", 1, "s").integers(0, 1000) == row_rng("x", 1, "s").integers(0, 1000)


def test_uniform_in_range():
    u = uniform_series(pd.Series([str(i) for i in range(200)]), 3, "u")
    assert (u >= 0).all() and (u < 1).all()
    assert 0.3 < u.mean() < 0.7


def test_rank_and_bernoulli_partition_invariant(spark):
    for parts in (2, 11):
        df = spark.range(0, 1000, numPartitions=parts).withColumn(
            "k", F.col("id").cast("string")
        )
        top = df.orderBy(rank_col("k", 9, "sel")).limit(10).select("k")
        vals = sorted(r.k for r in top.collect())
        bern = df.where(bernoulli_col("k", 9, "b", 0.1)).count()
        if parts == 2:
            ref_vals, ref_bern = vals, bern
    assert vals == ref_vals
    assert bern == ref_bern
    assert 60 <= ref_bern <= 140  # ~Binomial(1000, .1)
