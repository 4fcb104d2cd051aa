"""Verbatim replay of the reference's shipped error program.

`benchmarking/error_table.csv` passes R-style column-pointer kwargs
(``date='dob'``, ``lname='lname'``, ``sex='gender_code'``,
``age='birth_age'``; parsed by the reference at `R/1_error.R:83-91`).
The driver must run that CSV text UNMODIFIED against a person fixture.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REF_CSV = "/root/reference/benchmarking/error_table.csv"


@pytest.fixture(scope="module")
def ref_csv_text():
    if not os.path.exists(REF_CSV):
        pytest.skip("reference CSV not present in this environment")
    with open(REF_CSV) as f:
        return f.read()


def test_parse_reference_csv(ref_csv_text):
    from rlerrorgenerator_spark.operators.driver import parse_error_table

    rows = parse_error_table(ref_csv_text)
    assert len(rows) == 21
    by_err = {}
    for r in rows:
        by_err.setdefault(r.error, []).append(r)
    assert "make_twins" in by_err and by_err["make_twins"][0].amount == 0.05
    assert by_err["married_name_change"][0].kwargs == {
        "lname": "lname", "sex": "gender_code", "age": "birth_age"}
    assert by_err["date_swap"][0].kwargs == {"date": "dob"}
    tokens = sorted(k.kwargs["token"] for k in by_err["date_replace"])
    assert tokens == ["day", "month", "year"]


def test_run_reference_csv_verbatim(spark, ref_csv_text):
    """End-to-end: the unmodified reference program over synth persons."""
    from rlerrorgenerator_spark.operators import mess_data
    from rlerrorgenerator_spark.operators.driver import parse_error_table
    from rlerrorgenerator_spark.sources.persons import (
        NICKNAMES,
        get_bdays,
        surname_dim,
        synth_persons,
    )

    cfg = parse_error_table(ref_csv_text)
    persons = get_bdays(synth_persons(spark, 800, seed=5), seed=5) \
        .localCheckpoint(eager=True)
    lookups = {
        "surnames": surname_dim(spark),
        "lookup": spark.createDataFrame(
            [(a, b) for a, b in NICKNAMES], ["key", "lookup"]
        ),
    }
    dirty, lineage = mess_data(persons, cfg, seed=5, lookups=lookups)
    counts = {r.error: r.n for r in
              lineage.groupBy("error").agg(F.count("*").alias("n")).collect()}
    # every operator family in the CSV leaves lineage
    for err in ("make_twins", "indel", "repl", "tpose",
                "invert_real_and_nicknames", "married_name_change",
                "add_name_suffix", "swap_fields", "date_swap",
                "date_replace_month", "date_replace_day", "date_replace_year",
                "date_transpose_day", "date_transpose_year",
                "make_missing", "duplicate"):
        assert counts.get(err, 0) > 0, f"no lineage for {err}: {counts}"
    # date ops hit the dob column named ONLY via the date= kwarg
    dob_errs = lineage.where(
        (F.col("field") == "dob") & F.col("error").startswith("date_")
    ).count()
    assert dob_errs > 0
    # add_duplicates appended clean copies
    assert dirty.where(F.col("rid").endswith("#dup1")).count() > 0
