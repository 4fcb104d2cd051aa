"""Person-domain labeled-pair generation + the reference's feature vector.

Mirrors `/root/reference/benchmarking/utils.R`:

- ``generate_pairs`` (`:502-645`): exact-match join on the five link
  fields → ground-truth labels via the shared stable id → negatives from
  single-field blocking joins → hard-negative cap (top 4×|matches| by a
  threshold score) → labeled pairs.
- ``add_feature_vector`` (`:189-311`): per-pair metric_* columns — dob
  component distances, day↔month swap flag, name dl/jw/soundex
  distances, z-scaled name frequencies, fname↔lname swap, gender
  composition, race flags, potential-marriage flag.

Spark design: categorical/date features are built-in expressions; the
dl (restricted Damerau-Levenshtein / OSA) and Jaro-Winkler distances are
Arrow-batched pandas UDFs matching stringdist's methods. Joins are
equi-joins Catalyst plans as broadcast/SMJ; the hard-negative cap is a
distributed global rank (functions/rank.py), not a single-task top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rlerrorgenerator_spark.functions.similarity import (
    jaro_winkler_udf,
    norm_levenshtein,
    osa_udf,
)
from rlerrorgenerator_spark.functions.stats import add_count_name

LINK_FIELDS = ["fname", "lname", "dob", "gender_code", "race_code"]
PERSON_ATTRS = ["fname", "mname", "lname", "dob", "birth_age",
                "gender_code", "race_code", "voter_reg_num"]


def _sided(df: DataFrame, side: str) -> DataFrame:
    return df.select(
        F.col("rid").alias(f"rid_{side}"),
        *[F.col(c).alias(f"{c}_{side}") for c in PERSON_ATTRS if c in df.columns],
        *[F.col(c).alias(f"{c}_{side}") for c in ("fname_freq_z", "lname_freq_z")
          if c in df.columns],
    )


def generate_person_pairs(clean: DataFrame, dirty: DataFrame,
                          neg_ratio: int = 4, seed: int = 42) -> DataFrame:
    """Labeled pairs (rid_a, rid_b, label) per `utils.R:502-645`.

    - positives: ground truth via shared ``voter_reg_num``
      (`utils.R:521-530`);
    - candidate negatives: union of single-field equi-joins on
      fname/lname/dob (`utils.R:548-586`), minus true matches
      (anti-join, `utils.R:589-590`);
    - hard-negative cap: top ``neg_ratio × |matches|`` by a cheap
      similarity score (`utils.R:620-628`), seeded tie-break.
    """
    a = clean.select(F.col("rid").alias("rid_a"),
                     *[F.col(c).alias(f"{c}_a") for c in ["fname", "lname", "dob", "voter_reg_num"]])
    b = dirty.select(F.col("rid").alias("rid_b"),
                     *[F.col(c).alias(f"{c}_b") for c in ["fname", "lname", "dob", "voter_reg_num"]])

    truth = a.join(b, F.col("voter_reg_num_a") == F.col("voter_reg_num_b")) \
             .select("rid_a", "rid_b", F.lit(True).alias("label"))

    blocks = None
    for fld in ("fname", "lname", "dob"):
        p = a.join(b, F.col(f"{fld}_a") == F.col(f"{fld}_b")).select("rid_a", "rid_b")
        blocks = p if blocks is None else blocks.unionByName(p)
    negs = (
        blocks.dropDuplicates(["rid_a", "rid_b"])
        .join(truth.select("rid_a", "rid_b"), ["rid_a", "rid_b"], "left_anti")
    )
    # cheap score for hard-negative ranking (`utils.R:594-617` shape)
    negs_scored = (
        negs.join(a, "rid_a").join(b, "rid_b")
        .withColumn(
            "__score",
            (F.lit(1.0) - norm_levenshtein(F.col("fname_a"), F.col("fname_b")))
            + (F.lit(1.0) - norm_levenshtein(F.col("lname_a"), F.col("lname_b")))
            + F.when(F.col("dob_a") == F.col("dob_b"), 1.0).otherwise(0.0),
        )
    )
    n_matches = truth.count()
    # Hard-negative cap via the DISTRIBUTED global rank — a plain
    # orderBy().limit(k) with data-dependent k in the millions funnels
    # the final ordering into one task (round-1 scale-killer). The rank
    # is exact and partitioning-independent (hash tie-break totalizes
    # the order), so the selected pair set is identical.
    from rlerrorgenerator_spark.functions.rank import global_rank

    ranked = global_rank(
        negs_scored.select(
            "rid_a", "rid_b", "__score",
            F.xxhash64(F.lit(seed), F.col("rid_a"), F.col("rid_b")).alias("__tb"),
        ),
        [F.desc("__score"), F.asc("__tb")],
    )
    hard_negs = (
        ranked.where(F.col("rn") <= int(neg_ratio * n_matches))
        .select("rid_a", "rid_b", F.lit(False).alias("label"))
    )
    return truth.unionByName(hard_negs)


SNAPSHOT_DATES = ("2013-04-01", "2017-03-01")  # apr13/mar17 (`utils.R:231-232`)


def add_person_features(pairs: DataFrame, clean: DataFrame, dirty: DataFrame) -> DataFrame:
    """The 23-feature family of ``add_feature_vector`` (`utils.R:189-311`)."""
    clean_f = add_count_name(add_count_name(clean, "fname"), "lname")
    dirty_f = add_count_name(add_count_name(dirty, "fname"), "lname")
    wide = pairs.join(_sided(clean_f, "a"), "rid_a").join(_sided(dirty_f, "b"), "rid_b")

    def lev(c1, c2):
        return norm_levenshtein(F.coalesce(F.col(c1), F.lit("")),
                                F.coalesce(F.col(c2), F.lit("")))

    def dl(c1, c2):
        # restricted Damerau-Levenshtein (stringdist 'dl'/'osa'), the
        # reference's primary distance (`utils.R:168-187,223-226`) —
        # diverges from lev exactly on the tpose operator's adjacent
        # transpositions ("1990" vs "9190": dl=1, lev=2)
        return osa_udf(F.coalesce(c1, F.lit("")), F.coalesce(c2, F.lit("")))

    d_a, d_b = F.col("dob_a"), F.col("dob_b")
    feats = (
        wide
        # dob component distances (`:223-226`, stringdist dl)
        .withColumn("metric_dob_full", dl(d_a.cast("string"), d_b.cast("string")))
        .withColumn("metric_dob_year",
                    dl(F.year(d_a).cast("string"), F.year(d_b).cast("string")))
        .withColumn("metric_dob_month",
                    dl(F.month(d_a).cast("string"), F.month(d_b).cast("string")))
        .withColumn("metric_dob_day",
                    dl(F.dayofmonth(d_a).cast("string"),
                       F.dayofmonth(d_b).cast("string")))
        # day↔month swap flag (`:227-230`)
        .withColumn(
            "metric_dob_swap",
            ((F.dayofmonth(d_a) == F.month(d_b)) & (F.month(d_a) == F.dayofmonth(d_b))
             & (F.dayofmonth(d_a) != F.month(d_a))).cast("double"),
        )
    )
    # ages vs the two fixed snapshot dates (`:231-232`)
    for i, snap in enumerate(SNAPSHOT_DATES, 1):
        sd = F.lit(snap).cast("date")
        feats = feats.withColumn(
            f"metric_age_diff_{i}",
            F.abs(F.floor(F.datediff(sd, d_a) / 365.25)
                  - F.floor(F.datediff(sd, d_b) / 365.25)).cast("double"),
        )
    # name distances {dl, jw, soundex} × {fname, lname} (`:235-245`)
    for fld in ("fname", "lname"):
        feats = (
            feats.withColumn(f"metric_{fld}_lev",
                             dl(F.col(f"{fld}_a"), F.col(f"{fld}_b")))
            .withColumn(
                f"metric_{fld}_jw",
                jaro_winkler_udf(F.coalesce(F.col(f"{fld}_a"), F.lit("")),
                                 F.coalesce(F.col(f"{fld}_b"), F.lit(""))),
            )
            .withColumn(
                f"metric_{fld}_soundex",
                (F.soundex(F.col(f"{fld}_a")) != F.soundex(F.col(f"{fld}_b"))).cast("double"),
            )
        )
    feats = (
        feats
        # z-scaled name frequencies (`:194-213,237-246`)
        .withColumn("metric_ffreq_a", F.col("fname_freq_z_a"))
        .withColumn("metric_ffreq_b", F.col("fname_freq_z_b"))
        .withColumn("metric_lfreq_a", F.col("lname_freq_z_a"))
        .withColumn("metric_lfreq_b", F.col("lname_freq_z_b"))
        # fname↔lname swap (`:250-254`): cross distances
        .withColumn(
            "metric_name_swap",
            ((lev("fname_a", "lname_b") < 0.15) & (lev("lname_a", "fname_b") < 0.15))
            .cast("double"),
        )
        # gender composition counts (`:257-261`)
        .withColumn(
            "metric_n_female",
            ((F.col("gender_code_a") == "f").cast("int")
             + (F.col("gender_code_b") == "f").cast("int")).cast("double"),
        )
        .withColumn(
            "metric_n_male",
            ((F.col("gender_code_a") == "m").cast("int")
             + (F.col("gender_code_b") == "m").cast("int")).cast("double"),
        )
        # race equality + ww/bb flags (`:264-269`)
        .withColumn("metric_race_eq",
                    (F.col("race_code_a") == F.col("race_code_b")).cast("double"))
        .withColumn(
            "metric_race_wwbb",
            (((F.col("race_code_a") == "w") & (F.col("race_code_b") == "w"))
             | ((F.col("race_code_a") == "b") & (F.col("race_code_b") == "b"))
             ).cast("double"),
        )
        # potential marriage (`:272-277`): lnames differ, a female side,
        # adult ages
        .withColumn(
            "metric_marriage",
            ((F.col("lname_a") != F.col("lname_b"))
             & ((F.col("gender_code_a") == "f") | (F.col("gender_code_b") == "f"))
             & (F.col("birth_age_a") >= 20) & (F.col("birth_age_b") >= 20)
             ).cast("double"),
        )
    )
    return feats


FEATURE_COLS = [
    "metric_dob_full", "metric_dob_year", "metric_dob_month", "metric_dob_day",
    "metric_dob_swap", "metric_age_diff_1", "metric_age_diff_2",
    "metric_fname_lev", "metric_fname_jw", "metric_fname_soundex",
    "metric_lname_lev", "metric_lname_jw", "metric_lname_soundex",
    "metric_ffreq_a", "metric_ffreq_b", "metric_lfreq_a", "metric_lfreq_b",
    "metric_name_swap", "metric_n_female", "metric_n_male",
    "metric_race_eq", "metric_race_wwbb", "metric_marriage",
]  # 23 features — build_model(inp_len=23), `utils.R:972,1421`
