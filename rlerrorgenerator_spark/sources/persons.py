"""Person-shaped fixture: the reference's native domain.

Synthesizes the voter-file shape the reference operates on
(`/root/reference/benchmarking/utils.R:55-77` preprocess: id, fname,
mname, lname, birth_age, gender_code, race_code, voter_reg_num, dob,
ffreq, lfreq), with embedded name dims standing in for the package data
(`fnames_male`/`fnames_female`/`lnames_all`/`names_lookup`,
`/root/reference/data/`). Deterministic per (row id, seed); distributed
via mapInPandas like the pages synth.

Includes ``get_bdays`` (`utils.R:1215-1277`): synthesize dobs from age
vs a snapshot date and mark twin candidates — groups sharing
(lname, birth_age) — with a shared ``bday_twin``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

FNAMES_MALE = [
    "james", "robert", "john", "michael", "david", "william", "richard",
    "joseph", "thomas", "charles", "christopher", "daniel", "matthew",
    "anthony", "mark", "donald", "steven", "paul", "andrew", "joshua",
]
FNAMES_FEMALE = [
    "mary", "patricia", "jennifer", "linda", "elizabeth", "barbara",
    "susan", "jessica", "sarah", "karen", "lisa", "nancy", "betty",
    "margaret", "sandra", "ashley", "kimberly", "emily", "donna", "michelle",
]
LNAMES = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis", "robinson", "walker", "young", "allen", "king",
    "wright", "scott", "torres", "nguyen", "hill", "flores",
]
# nickname dim, shape of names_lookup (`exta/nick.R:19-29`)
NICKNAMES = [
    ("james", "jim"), ("james", "jimmy"), ("robert", "bob"), ("robert", "rob"),
    ("john", "jack"), ("michael", "mike"), ("david", "dave"),
    ("william", "bill"), ("william", "will"), ("richard", "dick"),
    ("richard", "rick"), ("joseph", "joe"), ("thomas", "tom"),
    ("charles", "chuck"), ("christopher", "chris"), ("daniel", "dan"),
    ("matthew", "matt"), ("anthony", "tony"), ("steven", "steve"),
    ("andrew", "andy"), ("joshua", "josh"), ("patricia", "pat"),
    ("jennifer", "jen"), ("elizabeth", "liz"), ("elizabeth", "beth"),
    ("susan", "sue"), ("jessica", "jess"), ("sarah", "sally"),
    ("margaret", "peggy"), ("sandra", "sandy"), ("kimberly", "kim"),
    ("emily", "em"), ("michelle", "shelly"),
]

PERSONS_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.StringType(), False),
        T.StructField("fname", T.StringType(), False),
        T.StructField("mname", T.StringType(), True),
        T.StructField("lname", T.StringType(), False),
        T.StructField("birth_age", T.IntegerType(), False),
        T.StructField("gender_code", T.StringType(), False),
        T.StructField("race_code", T.StringType(), False),
        T.StructField("voter_reg_num", T.StringType(), False),
    ]
)


def _person_rows(ids: np.ndarray, seed: int) -> pd.DataFrame:
    rows = []
    for i in ids:
        rng = np.random.default_rng((int(i) << 21) ^ (seed * 0x85EBCA6B & 0xFFFFFFFF))
        male = bool(rng.random() < 0.5)
        pool = FNAMES_MALE if male else FNAMES_FEMALE
        fname = pool[int(rng.integers(0, len(pool)))]
        mname = pool[int(rng.integers(0, len(pool)))] if rng.random() < 0.7 else None
        lname = LNAMES[int(rng.integers(0, len(LNAMES)))]
        rows.append(
            (
                f"p{int(i):08d}", fname, mname, lname,
                int(rng.integers(18, 95)),
                "m" if male else "f",
                ["w", "b", "a", "o"][int(rng.choice(4, p=[0.6, 0.25, 0.1, 0.05]))],
                f"vrn{int(i):010d}",
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in PERSONS_SCHEMA.fields])


def synth_persons(spark: SparkSession, n: int, seed: int = 42,
                  partitions: int | None = None) -> DataFrame:
    if partitions is None:
        partitions = max(2, min(256, n // 5000 + 1, n))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _person_rows(b["id"].to_numpy(), seed)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, schema=PERSONS_SCHEMA
    )


def nickname_lookup(spark: SparkSession) -> DataFrame:
    """names_lookup-shaped dim: both directions
    (`/root/reference/data/names_lookup.rda`; SURVEY.md §1.1)."""
    rows = [(i, a, b, "to_nick") for i, (a, b) in enumerate(NICKNAMES)] + [
        (len(NICKNAMES) + i, b, a, "to_proper") for i, (a, b) in enumerate(NICKNAMES)
    ]
    return spark.createDataFrame(
        rows, ["lookup_id", "lookup_name", "lookup_alternate", "lookup_type"]
    )


def surname_dim(spark: SparkSession) -> DataFrame:
    """lnames_all-shaped dim (1 column)."""
    return spark.createDataFrame([(s,) for s in LNAMES], ["lname"])


def get_bdays(persons: DataFrame, seed: int = 42,
              as_of_year: int = 2024, rng: str = "xxhash") -> DataFrame:
    """Synthesize dob from age + mark twin candidates
    (`/root/reference/benchmarking/utils.R:1215-1277`): rows sharing
    (lname, birth_age) form a twin group; all members share ``bday_twin``
    (the group min dob) and a ``twin_id``."""
    if rng == "md5":
        from rlerrorgenerator_spark.rng import draw_token, md5_mod
        doy = md5_mod(draw_token(seed, "bday", "doy"), "rid", 365)
    else:
        doy = F.pmod(F.xxhash64(F.lit(f"bday|{seed}"), F.col("rid")), F.lit(365)).cast("int")
    year = F.lit(as_of_year) - F.col("birth_age")
    with_dob = persons.withColumn(
        "dob", F.date_add(F.make_date(year, F.lit(1), F.lit(1)), doy)
    )
    w = Window.partitionBy("lname", "birth_age")
    return (
        with_dob.withColumn("__grp_n", F.count("*").over(w))
        .withColumn(
            "twin_id",
            F.when(F.col("__grp_n") > 1,
                   F.concat_ws("|", "lname", F.col("birth_age").cast("string"))),
        )
        .withColumn(
            "bday_twin", F.when(F.col("__grp_n") > 1, F.min("dob").over(w))
        )
        .drop("__grp_n")
    )
