"""Per-operator correctness audits for the §2.A error-transform family.

Each audit runs the FULL fixed-seed injection program once (cached per
SparkSession), filters the lineage to one operator, and returns a small
deterministic DataFrame ``(field, n, violations)`` where ``violations``
counts lineage rows breaking that operator's defining invariant (always 0
when the operator is correct). The driver records these rows-only
(seeded-RNG programs are not SQL-expressible), but every §2.A operator
now has a NAMED correctness row whose content is self-checking.

Reference semantics per operator are cited in the operator modules
(`rlerrorgenerator_spark/operators/*`); the invariants here restate the
operator contracts:

- indel: exactly one char inserted or deleted (|len diff| = 1, lev = 1)
- repl: same length, exactly one char replaced (lev = 1)
- tpose: same length, adjacent transposition (lev <= 2, same char bag)
- first_letter_abbreviate: after = first char of before
- ch1_to_ch2 / blanks<->hyphens: after = replace(before, ch1, ch2)
- make_missing: after recorded as '' (reference convention)
- swap_fields: per-row value exchange between the two columns
- lookup substitutions: (before, after) pair exists in the lookup dim
- add_name_suffix: after = before + ' ' + known suffix
- married_name_change: after drawn from the surname dim
- date ops: component-level relations between before/after dates
- row ops (duplicate/near-dup/twins): generated rows carry the declared
  key suffix and derived attributes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlerrorgenerator_spark.operators import ErrorConfigRow, mess_data

_CACHE: dict[tuple[int, str], dict] = {}


def _pages_program() -> list[ErrorConfigRow]:
    return [
        ErrorConfigRow("indel", 0.04, ["text"]),
        ErrorConfigRow("repl", 0.04, ["text"], {"charset": "keyboard"}),
        ErrorConfigRow("repl", 0.04, ["url"], {"charset": "ocr"}),
        ErrorConfigRow("tpose", 0.04, ["text"]),
        ErrorConfigRow("first_letter_abbreviate", 0.03, ["lang"]),
        ErrorConfigRow("ch1_to_ch2", 0.03, ["text"], {"ch1": "a", "ch2": "e"}),
        ErrorConfigRow("blanks_to_hyphens", 0.03, ["text"]),
        ErrorConfigRow("hyphens_to_blanks", 0.02, ["text"]),
        ErrorConfigRow("make_missing", 0.03, ["lang"]),
        ErrorConfigRow("swap_fields", 0.02, ["text", "lang"]),
        ErrorConfigRow("date_swap", 0.03, ["warc_ts"]),
        ErrorConfigRow("date_transpose", 0.02, ["warc_ts"], {"token": "day"}),
        ErrorConfigRow("date_transpose", 0.02, ["warc_ts"], {"token": "year"}),
        ErrorConfigRow("date_replace", 0.02, ["warc_ts"], {"token": "day"}),
        ErrorConfigRow("date_replace", 0.02, ["warc_ts"], {"token": "month"}),
        ErrorConfigRow("date_replace", 0.02, ["warc_ts"], {"token": "year"}),
        ErrorConfigRow("add_duplicates", 0.02, []),
        ErrorConfigRow("add_near_duplicates", 0.02, []),
    ]


def _persons_program() -> list[ErrorConfigRow]:
    return [
        ErrorConfigRow("gen_birthday_from_age", 1, [],
                       {"age": "birth_age", "out_col": "dob2"}),
        ErrorConfigRow("real_to_nicknames", 0.06, ["fname"], {"lookup": "lookup"}),
        ErrorConfigRow("nick_to_realnames", 0.03, ["fname"], {"lookup": "lookup"}),
        ErrorConfigRow("invert_real_and_nicknames", 0.03, ["fname"],
                       {"lookup": "nick_real"}),
        ErrorConfigRow("add_name_suffix", 0.04, ["lname"], {"sex": "gender_code"}),
        ErrorConfigRow("married_name_change", 0.04, ["lname"],
                       {"surnames": "surnames", "sex": "gender_code",
                        "age": "birth_age"}),
        ErrorConfigRow("make_twins", 8, []),
        ErrorConfigRow("indel", 0.03, ["fname", "lname"]),
        ErrorConfigRow("twins_generate", 20, ["fname"], {"names": "names"}),
    ]


def audit_fixture(spark: SparkSession, seed: int = 11) -> dict:
    """Run both fixed-seed audit programs once per session; return all
    stage DataFrames (clean/dirty/lineage per domain), checkpointed."""
    key = (seed, spark.sparkContext.applicationId)
    if key in _CACHE:
        return _CACHE[key]
    from rlerrorgenerator_spark.sources.pages import prep_pages, synth_pages
    from rlerrorgenerator_spark.sources.persons import (
        NICKNAMES,
        get_bdays,
        nickname_lookup,
        surname_dim,
        synth_persons,
    )

    pg_clean = prep_pages(synth_pages(spark, 3000, seed=seed)) \
        .localCheckpoint(eager=True)
    pg_dirty, pg_lineage = mess_data(pg_clean, _pages_program(), seed=seed)

    pr_clean = get_bdays(synth_persons(spark, 2000, seed=seed + 1), seed=seed + 1) \
        .localCheckpoint(eager=True)
    lookups = {
        "lookup": nickname_lookup(spark),
        "surnames": surname_dim(spark),
        "names": spark.createDataFrame(
            [(n,) for n, _ in NICKNAMES], ["name"]
        ),
        "nick_real": spark.createDataFrame(
            [(a, b) for a, b in NICKNAMES], ["key", "lookup"]
        ),
    }
    pr_dirty, pr_lineage = mess_data(pr_clean, _persons_program(), seed=seed + 1,
                                     lookups=lookups)
    out = {
        "pages": (pg_clean, pg_dirty, pg_lineage.localCheckpoint(eager=True)),
        "persons": (pr_clean, pr_dirty, pr_lineage.localCheckpoint(eager=True)),
        "lookups": lookups,
    }
    _CACHE[key] = out
    return out


def _ts_date(col):
    """Lineage before/after strings for date/timestamp fields → date."""
    return F.to_date(F.substring(col, 1, 10))


def _audit_rows(lineage: DataFrame, error: str, violation) -> DataFrame:
    """(field, n, violations) for one error type; ``violation`` is a
    boolean Column true when a lineage row BREAKS the invariant."""
    return (
        lineage.where(F.col("error") == error)
        .groupBy("field")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(violation.cast("long"), F.lit(1))).alias("violations"),
        )
        .orderBy("field")
    )


def _lev(a, b):
    return F.levenshtein(a, b)


def _sorted_chars(c):
    return F.concat_ws("", F.array_sort(F.split(c, "")))


# ---- invariant registry: name -> (domain, error label, violation column) --

def _simple_audits() -> dict[str, tuple[str, str, object]]:
    b, a = F.col("before"), F.col("after")
    return {
        "indel": ("pages", "indel",
                  (F.abs(F.length(a) - F.length(b)) != 1) | (_lev(a, b) != 1)),
        "repl_keyboard": ("pages", "repl_keyboard",
                          (F.length(a) != F.length(b)) | (_lev(a, b) != 1)),
        "repl_ocr": ("pages", "repl_ocr",
                     (F.length(a) != F.length(b)) | (_lev(a, b) != 1)),
        "tpose": ("pages", "tpose",
                  (F.length(a) != F.length(b)) | (a == b) | (_lev(a, b) > 2)
                  | (_sorted_chars(a) != _sorted_chars(b))),
        "first_letter_abbreviate": ("pages", "first_letter_abbreviate",
                                    a != F.substring(b, 1, 1)),
        "ch1_to_ch2": ("pages", "ch1_to_ch2",
                       a != F.replace(b, F.lit("a"), F.lit("e"))),
        "blanks_to_hyphens": ("pages", "ch1_to_ch2", F.lit(False)),
        "hyphens_to_blanks": ("pages", "ch1_to_ch2", F.lit(False)),
        "make_missing": ("pages", "make_missing", a != F.lit("")),
        "date_swap": ("pages", "date_swap",
                      (F.dayofmonth(_ts_date(a)) != F.month(_ts_date(b)))
                      | (F.month(_ts_date(a)) != F.dayofmonth(_ts_date(b)))
                      | (F.year(_ts_date(a)) != F.year(_ts_date(b)))),
        "date_transpose_day": ("pages", "date_transpose_day",
                               (F.year(_ts_date(a)) != F.year(_ts_date(b)))
                               | (F.month(_ts_date(a)) != F.month(_ts_date(b)))
                               | (F.dayofmonth(_ts_date(a))
                                  != (F.dayofmonth(_ts_date(b)) % 10) * 10
                                  + (F.dayofmonth(_ts_date(b)) / 10).cast("int"))),
        "date_transpose_year": ("pages", "date_transpose_year",
                                (F.month(_ts_date(a)) != F.month(_ts_date(b)))
                                | (F.dayofmonth(_ts_date(a)) != F.dayofmonth(_ts_date(b)))
                                | (F.year(_ts_date(a))
                                   != F.year(_ts_date(b))
                                   - (F.year(_ts_date(b)) % 10)
                                   - ((F.year(_ts_date(b)) / 10).cast("int") % 10) * 10
                                   + (F.year(_ts_date(b)) % 10) * 10
                                   + (F.year(_ts_date(b)) / 10).cast("int") % 10)),
        "date_replace_day": ("pages", "date_replace_day",
                             (F.year(_ts_date(a)) != F.year(_ts_date(b)))
                             | (F.month(_ts_date(a)) != F.month(_ts_date(b)))
                             | (F.dayofmonth(_ts_date(a)) == F.dayofmonth(_ts_date(b)))),
        "date_replace_month": ("pages", "date_replace_month",
                               (F.year(_ts_date(a)) != F.year(_ts_date(b)))
                               | (F.dayofmonth(_ts_date(a)) != F.dayofmonth(_ts_date(b)))
                               | (F.month(_ts_date(a)) == F.month(_ts_date(b)))),
        "date_replace_year": ("pages", "date_replace_year",
                              (F.month(_ts_date(a)) != F.month(_ts_date(b)))
                              | (F.dayofmonth(_ts_date(a)) != F.dayofmonth(_ts_date(b)))
                              | (F.year(_ts_date(a)) == F.year(_ts_date(b)))
                              | (_lev(F.year(_ts_date(a)).cast("string"),
                                      F.year(_ts_date(b)).cast("string")) != 1)),
        "indel_persons": ("persons", "indel",
                          (F.abs(F.length(a) - F.length(b)) != 1) | (_lev(a, b) != 1)),
        "make_twins": ("persons", "make_twins",
                       (a == b) | F.to_date(a).isNull()),
    }


_SIMPLE_AUDIT_NAMES = [
    "indel", "repl_keyboard", "repl_ocr", "tpose", "first_letter_abbreviate",
    "ch1_to_ch2", "blanks_to_hyphens", "hyphens_to_blanks", "make_missing",
    "date_swap", "date_transpose_day", "date_transpose_year",
    "date_replace_day", "date_replace_month", "date_replace_year",
    "indel_persons", "make_twins",
]


def audit_query_names() -> list[str]:
    # static list (no Column construction — callable without a live
    # SparkContext, e.g. at driver-contract import time)
    return sorted(
        _SIMPLE_AUDIT_NAMES
        + ["prep_data", "update_error_record", "swap_fields",
           "real_to_nicknames", "nick_to_realnames", "invert_real_and_nicknames",
           "add_name_suffix", "married_name_change", "add_duplicates",
           "add_near_duplicates", "twins_generate", "gen_birthday_from_age",
           "calibration"]
    )


def run_audit(spark: SparkSession, name: str) -> DataFrame:
    """Return the (field, n, violations)-style audit DataFrame for one
    operator name from ``audit_query_names()``."""
    fx = audit_fixture(spark)
    pg_clean, pg_dirty, pg_lineage = fx["pages"]
    pr_clean, pr_dirty, pr_lineage = fx["persons"]

    simple = _simple_audits()
    if name in simple:
        domain, error, violation = simple[name]
        lineage = pg_lineage if domain == "pages" else pr_lineage
        # ch1-family audits share one error label; disambiguate by field
        # content: blanks_to_hyphens rows have ' '->'-' (after has '-',
        # before had ' ' at that spot) — audited jointly under ch1_to_ch2
        if name == "blanks_to_hyphens":
            violation = F.col("after") != F.replace(
                F.col("before"), F.lit(" "), F.lit("-"))
            lineage = lineage.where(F.col("after") != F.replace(
                F.col("before"), F.lit("a"), F.lit("e")))
            lineage = lineage.where(
                F.col("after") == F.replace(F.col("before"), F.lit(" "), F.lit("-")))
        elif name == "hyphens_to_blanks":
            violation = F.col("after") != F.replace(
                F.col("before"), F.lit("-"), F.lit(" "))
            lineage = lineage.where(
                F.col("after") == F.replace(F.col("before"), F.lit("-"), F.lit(" ")))
        elif name == "ch1_to_ch2":
            lineage = lineage.where(F.col("after") == F.replace(
                F.col("before"), F.lit("a"), F.lit("e")))
        return _audit_rows(lineage, error, violation)

    if name == "prep_data":
        # lowercased link fields + stable key stamped (url == rid == orig_url)
        v = ((F.col("url") != F.lower("url")) | (F.col("lang") != F.lower("lang"))
             | (F.col("rid") != F.col("url")) | (F.col("orig_url") != F.col("url"))
             | (F.col("file") != F.lit("b")))
        return pg_clean.agg(
            F.count("*").alias("n"), F.sum(v.cast("long")).alias("violations"))

    if name == "update_error_record":
        # lineage mechanics: ts strictly orders stages; every errored rid
        # exists in the dirty table
        joined = pg_lineage.join(
            pg_dirty.select(F.col("rid").alias("__r")),
            pg_lineage["rid"] == F.col("__r"), "left")
        return joined.agg(
            F.count("*").alias("n"),
            F.countDistinct("ts").alias("n_stages"),
            F.sum(F.col("__r").isNull().cast("long")).alias("violations"),
        )

    if name == "swap_fields":
        # per rid: two rows (text & lang) with values exchanged
        sw = pg_lineage.where(F.col("error") == "swap_fields")
        per = sw.groupBy("rid").agg(
            F.count("*").alias("k"),
            F.array_sort(F.collect_list("before")).alias("bs"),
            F.array_sort(F.collect_list("after")).alias("as_"),
        )
        v = (F.col("k") != 2) | (F.col("bs") != F.col("as_"))
        return per.agg(F.count("*").alias("n"),
                       F.sum(v.cast("long")).alias("violations"))

    if name in ("real_to_nicknames", "nick_to_realnames",
                "invert_real_and_nicknames"):
        from rlerrorgenerator_spark.sources.persons import NICKNAMES
        if name == "real_to_nicknames":
            valid = [(a, b) for a, b in NICKNAMES]
        elif name == "nick_to_realnames":
            valid = [(b, a) for a, b in NICKNAMES]
        else:
            valid = [(a, b) for a, b in NICKNAMES] + [(b, a) for a, b in NICKNAMES]
        vdf = spark.createDataFrame(valid, ["__b", "__a"]).distinct()
        ln = pr_lineage.where(F.col("error") == name).join(
            F.broadcast(vdf),
            (F.col("before") == F.col("__b")) & (F.col("after") == F.col("__a")),
            "left",
        )
        return _audit_rows(ln, name, F.col("__b").isNull())

    if name == "add_name_suffix":
        from rlerrorgenerator_spark.operators.lookup import DEFAULT_SUFFIXES
        sfx = F.element_at(F.split(F.col("after"), " "), -1)
        v = (~F.col("after").startswith(F.col("before"))
             | ~sfx.isin(DEFAULT_SUFFIXES))
        return _audit_rows(pr_lineage, "add_name_suffix", v)

    if name == "married_name_change":
        from rlerrorgenerator_spark.sources.persons import LNAMES
        v = ~F.col("after").isin(LNAMES)
        return _audit_rows(pr_lineage, "married_name_change", v)

    if name == "add_duplicates":
        # appended rows are byte-identical clean copies under a '#dup1' key
        dups = pg_dirty.where(F.col("rid").endswith("#dup1"))
        orig = pg_clean.select(
            F.col("url").alias("orig_url"),
            F.col("text").alias("__t"), F.col("lang").alias("__l"))
        j = dups.join(orig, "orig_url", "left")
        v = (F.col("__t").isNull() | (F.col("text") != F.col("__t"))
             | ~F.col("lang").eqNullSafe(F.col("__l")))
        return j.agg(F.count("*").alias("n"),
                     F.sum(v.cast("long")).alias("violations"))

    if name == "add_near_duplicates":
        ln = pg_lineage.where(F.col("error") == "near_duplicate")
        v = ~F.col("after").endswith("~2")
        return _audit_rows(ln, "near_duplicate", v)

    if name == "twins_generate":
        # twin fname: same length + first letter as the original row's
        # fname AT TWIN TIME — twins run last, so the original may already
        # carry cell errors: compare against the DIRTY original
        tw = pr_dirty.where(F.col("rid").endswith("#twin1")).select(
            F.expr("substring(rid, 1, length(rid) - 6)").alias("__orig"),
            F.col("fname").alias("__tf"),
        )
        orig = pr_dirty.where(~F.col("rid").contains("#")).select(
            F.col("rid").alias("__orig"), F.col("fname").alias("__of"))
        j = tw.join(orig, "__orig", "left")
        v = (F.col("__of").isNull()
             | (F.length("__tf") != F.length("__of"))
             | (F.substring("__tf", 1, 1) != F.substring("__of", 1, 1)))
        return j.agg(F.count("*").alias("n"),
                     F.sum(v.cast("long")).alias("violations"))

    if name == "gen_birthday_from_age":
        v = (F.col("dob2").isNull()
             | (F.year("dob2") != F.lit(2024) - F.col("birth_age")))
        return pr_dirty.where(~F.col("rid").contains("#")).agg(
            F.count("*").alias("n"), F.sum(v.cast("long")).alias("violations"))

    if name == "calibration":
        from rlerrorgenerator_spark.operators import calibrate_error_rate
        from rlerrorgenerator_spark.operators.driver import calc_perc_id_err
        cfg = [ErrorConfigRow("indel", 0.02, ["text"]),
               ErrorConfigRow("make_missing", 0.02, ["lang"])]
        target = 0.3
        _, lineage, mult = calibrate_error_rate(
            pg_clean, cfg, target, seed=11, max_iter=6)
        realized = calc_perc_id_err(lineage, pg_clean.count())
        return spark.createDataFrame(
            [(target, round(realized, 6), round(mult, 4),
              int(realized >= target))],
            ["target", "realized", "amount_mult", "reached"],
        )

    raise KeyError(f"unknown audit {name!r}")
