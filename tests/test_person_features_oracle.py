"""er_person_features driver row: cross-engine parity of the person-domain
23-feature pair matrix (`/root/reference/benchmarking/utils.R:189-311`)
against its DuckDB oracle, plus the structural proofs the gates rely on:

- the portable SQL Soundex equals Spark's ``F.soundex`` on EVERY name the
  fixture can produce (pool names, first-letter abbreviations, all
  x-splices);
- OSA == DuckDB's unrestricted damerau_levenshtein on the entire gate
  region (normalized DL < 0.3) of that same producible-name set, and on
  the full numeric-component / day↔month-swap cross-products (ungated
  columns).
"""

from __future__ import annotations

import itertools

import duckdb
import pytest
from pyspark.sql import functions as F

from rlerrorgenerator_spark.functions.similarity import osa_distance
from rlerrorgenerator_spark.sources.persons import (
    FNAMES_FEMALE,
    FNAMES_MALE,
    LNAMES,
)

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["customer"]


def _producible_names() -> list[str]:
    names = sorted(set(FNAMES_FEMALE + FNAMES_MALE + LNAMES))
    variants = set(names)
    for n in names:
        variants.add(n[0])  # fname abbreviation
        for i in range(len(n)):  # every lname x-splice position
            variants.add(n[:i] + "x" + n[i + 1 :])
    return sorted(variants)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_cross_engine_match_sf0001(spark, con):
    """The definitive check: Spark query == DuckDB oracle, every value."""
    import __spark_entry__ as e

    got = [tuple(r) for r in e.queries()["er_person_features"](spark, SF_DIR).collect()]
    want = [tuple(r) for r in con.execute(e.oracle_sql()["er_person_features"]).fetchall()]
    assert len(got) == len(want) and len(got) > 0
    assert got == want


def test_sql_soundex_matches_spark(spark):
    """Portable SQL Soundex == F.soundex on all producible names."""
    from rlerrorgenerator_spark.oracle_er import _sql_soundex

    variants = _producible_names()
    sdf = spark.createDataFrame([(v,) for v in variants], ["s"])
    spark_codes = dict(
        sdf.select("s", F.soundex("s").alias("c")).collect()
    )
    c = duckdb.connect()
    c.execute("CREATE TABLE v(s VARCHAR)")
    c.executemany("INSERT INTO v VALUES (?)", [(x,) for x in variants])
    duck_codes = dict(c.execute(f"SELECT s, {_sql_soundex('s')} FROM v").fetchall())
    bad = {s for s in variants if spark_codes[s] != duck_codes[s]}
    assert not bad, sorted(bad)[:10]


def test_osa_equals_dl_on_gate_region():
    """OSA == unrestricted DL wherever the oracle's 0.3 gate can emit.

    Strategy: let DuckDB compute DL for the full producible-name cross
    product (fast, vectorized), keep only gate-region pairs (normalized
    DL < 0.3 — a superset of pairs either engine emits, since OSA ≥ DL),
    then check OSA equality on just those.
    """
    variants = _producible_names()
    c = duckdb.connect()
    c.execute("CREATE TABLE v(s VARCHAR)")
    c.executemany("INSERT INTO v VALUES (?)", [(x,) for x in variants])
    rows = c.execute(
        """
        SELECT a.s, b.s, damerau_levenshtein(a.s, b.s) AS d
        FROM v a CROSS JOIN v b
        WHERE damerau_levenshtein(a.s, b.s)::DOUBLE
              / greatest(length(a.s), length(b.s), 1) < 0.3
        """
    ).fetchall()
    assert len(rows) > len(variants)  # at least the diagonal + near pairs
    bad = [(a, b, d, osa_distance(a, b)) for a, b, d in rows
           if osa_distance(a, b) != d]
    assert not bad, bad[:10]


def test_osa_equals_dl_on_ungated_components():
    """metric_dob_{year,month,day} are ungated: prove OSA == DL on the
    full numeric cross-products and on every day↔month swap shape."""
    c = duckdb.connect()
    nums = [str(x) for x in range(1, 32)]
    years = [str(y) for y in range(1930, 2007)]
    dates = [
        (f"1990-{m:02d}-{d:02d}", f"1990-{d:02d}-{m:02d}")
        for m in range(1, 13)
        for d in range(1, 13)
    ]
    pairs = (
        list(itertools.product(nums, nums))
        + list(itertools.product(years, years))
        + dates
    )
    c.execute("CREATE TABLE p(a VARCHAR, b VARCHAR)")
    c.executemany("INSERT INTO p VALUES (?,?)", pairs)
    rows = c.execute("SELECT a, b, damerau_levenshtein(a,b) FROM p").fetchall()
    bad = [(a, b, d, osa_distance(a, b)) for a, b, d in rows
           if osa_distance(a, b) != d]
    assert not bad, bad[:10]
