"""Deduplication strategies for web-scale training-data pipelines.

Four tiers, cheapest first — exactly the menu a 100 TB corpus cleanup
runs, each as a DataFrame plan:

1. exact: hash-groupBy on a normalized fingerprint (md5). One shuffle,
   map-side partial agg.
2. n-gram Jaccard: word-k-shingles, inverted-index self-join on shingle,
   jaccard = |∩| / (|A|+|B|−|∩|). Selective shingles (k=5 words) keep the
   join sparse; hot shingles capped like hot blocks.
3. MinHash-LSH: signature bands → bucket join (see linkage/blocking.py
   for the pages-table variant; this one hashes with md5 so DuckDB can
   oracle it bit-for-bit).
4. SimHash: 64-bit sketch, hamming-distance pairs via band join.

Embedding near-dup (cosine) lives in plans/ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rlerrorgenerator_spark.functions.textops import fingerprint, tokens, word_shingles


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, group_size, keep_id) for every duplicate group."""
    fp = df.select(F.col(id_col).alias("id"), fingerprint(text_col).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("group_size"), F.min("id").alias("keep_id"))
        .where(F.col("group_size") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per fingerprint."""
    w_fp = fingerprint(text_col).alias("fp")
    keep = (
        df.select(F.col(id_col).alias("id"), w_fp)
        .groupBy("fp").agg(F.min("id").alias(id_col))
    )
    return df.join(keep.select(id_col), id_col, "left_semi")


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        threshold: float = 0.8,
                        max_shingle_freq: int = 100) -> DataFrame:
    """Near-dup pairs (id_a < id_b, jaccard) over distinct word-k-shingles.

    Inverted-index join: explode shingles, self-join on shingle value,
    count intersections, then jaccard from per-doc shingle counts.
    ``max_shingle_freq`` drops boilerplate shingles (skew guard — at
    corpus scale a handful of shingles appear everywhere and would square
    the join).
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("g")
    )
    hot = sh.groupBy("g").count().where(F.col("count") > max_shingle_freq).select("g")
    sh = sh.join(F.broadcast(hot), "g", "left_anti")
    counts = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.toDF("g", "id_a")
    b = sh.toDF("g", "id_b")
    inter = (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    ca = counts.toDF("id_a", "na")
    cb = counts.toDF("id_b", "nb")
    return (
        inter.join(ca, "id_a").join(cb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("i").cast("double")
                    / (F.col("na") + F.col("nb") - F.col("i")).cast("double"), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _md5_u64(col, salt: str):
    """Bytes 8..16 of md5(salt || value), big-endian, as a zero-padded
    20-digit decimal STRING — bit-identical to DuckDB's
    ``lpad((('0x' || substring(md5(salt || g), 17, 16))::UBIGINT)::varchar,
    20, '0')``, which is what makes the MinHash signature oracle-checkable
    cross-engine. String min == numeric min due to fixed-width padding."""
    return F.lpad(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 17, 16), 16, 10),
        20, "0",
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 12,
                       k: int = 5) -> DataFrame:
    """(id, mh_0..mh_{n-1}) MinHash signature over word-k-shingles."""
    # explode + one groupBy with n min-aggs: the array-expression form
    # (array_min(transform(...)) per hash) triggers Catalyst projection
    # collapse, inlining the shingle construction into each of the n
    # expressions (n× recompute per row).
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, k)).alias("g")
    )
    aggs = [
        F.min(_md5_u64(F.col("g"), f"mh{i}|")).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_dup_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n_hashes: int = 12,
                      bands: int = 6, k: int = 5) -> DataFrame:
    """LSH banding over MinHash signatures → candidate pairs (id_a<id_b,
    n_bands agreeing). bands × rows = n_hashes."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes, k)
    # single explode of (band, bkey) structs — a per-band union would
    # re-evaluate the signature aggregation once per band
    structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bkey"),
        )
        for b in range(bands)
    ])
    out = sig.select("id", F.explode(structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    a = out.toDF("id_a", "band", "bkey")
    b2 = out.toDF("id_b", "band", "bkey")
    return (
        a.join(b2, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: sign-sum of token-hash bits.

    Built-in only: explode tokens → xxhash64 → per-bit ±1 aggregation via
    64 conditional sums → reassemble the sketch. One shuffle (groupBy id).
    """
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t"))
    h = tok.withColumn("h", F.xxhash64("t"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = h.groupBy("id").agg(*aggs)
    sketch = F.lit(0).cast("long")
    for i in range(64):
        sketch = sketch + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("id", sketch.alias("simhash"))


def simhash_dup_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Banding: split the 64-bit sketch into 4 × 16-bit bands; any pair
    within hamming ≤ 3·16/... (pigeonhole: ≤3 differing bands ⇒ one band
    equal) joins on an equal band, then exact hamming filters via
    bit_count(xor).
    """
    sk = simhash(df, text_col, id_col)
    bands = [
        (F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)))
        .alias(f"band_{i}")
        for i in range(4)
    ]
    sig = sk.select("id", "simhash", *bands)
    out = None
    for i in range(4):
        part = sig.select("id", "simhash", F.lit(i).alias("band"),
                          F.col(f"band_{i}").alias("bkey"))
        out = part if out is None else out.unionByName(part)
    a = out.toDF("id_a", "sim_a", "band", "bkey")
    b = out.toDF("id_b", "sim_b", "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
