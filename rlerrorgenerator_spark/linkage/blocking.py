"""Blocking: candidate-pair generation without O(n²) enumeration.

The reference blocks with 6 single-field equi-joins
(`/root/reference/benchmarking/utils.R:548-586`). Per the north star we
generalize to three strategies over the pages domain, unioned + deduped:

1. exact blocks on normalized keys (url, text prefix) — equi-joins,
   sort-merge/broadcast picked by Catalyst/AQE;
2. sorted-neighborhood over a sort key — Spark's global ``orderBy`` is a
   range-partitioned sort (scales out), neighbors via banded self-join;
3. MinHash-LSH on text shingles — shingling, hashing and band signatures
   all with built-in expressions (``sequence``/``transform``/``xxhash64``
   /``array_min``), so the whole thing is JVM-side and deterministic.

Skew: pathological blocks (empty/boilerplate text → one giant LSH bucket)
are capped at ``max_block_size`` before the pair join — the explicit
skew-key handling the north rule asks for (AQE skew-join splitting covers
residual imbalance).

Conventions: the clean side exposes ``rid_a`` (its url), the dirty side
``rid_b`` (its row key). Output: ``(rid_a, rid_b, block)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import Column


def normalize_url(col) -> Column:
    """Lowercase, strip scheme + www + trailing slash — the link-key
    normalization (analogue of the reference's ingest lowercasing,
    `R/1_error.R:15-17`)."""
    c = F.lower(col if isinstance(col, Column) else F.col(col))
    # strip ANY scheme-shaped prefix, not just literal http(s) — injected
    # char errors can land inside the scheme ("hftps://...") and a strict
    # regex would leave the whole prefix in the comparison
    c = F.regexp_replace(c, r"^[a-z0-9]{2,8}://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    return F.regexp_replace(c, r"/$", "")


def _cap_blocks_two_sided(a: DataFrame, b: DataFrame, keys: list[str],
                          max_block_size: int) -> tuple[DataFrame, DataFrame]:
    """Drop keys whose group exceeds ``max_block_size`` on either side —
    the explicit skew guard in front of every block equi-join.

    Default (window form): each side filters itself with a per-key count
    window — ``count() OVER (PARTITION BY keys)`` then
    ``count ≤ max_block_size``. No driver participation at all: no
    hot-list collect, no broadcast build, no checkpoint, and the window's
    hash exchange on ``keys`` is exactly the partitioning the downstream
    pair join needs, so Catalyst reuses it (one exchange per side total).
    Each side has a single consumer, so the double-evaluation trap that
    forced lazy localCheckpoints on the broadcast form (signature
    aggregation re-run under the build AND probe sides) cannot occur.
    Per-side capping also matches the cross-engine oracles' SQL
    (``bkey NOT IN (SELECT … HAVING count > N)`` per side) row-for-row.

    ``SPARK_GRAFT_WINDOW_CAPS=0`` restores the broadcast-blacklist form
    (one union-side count + one broadcast + anti-joins, lazy-checkpointed
    per side) for A/B measurement. Pair-set equivalence of the two forms:
    a key hot on one side contributes no pairs either way, because its
    rows vanish from that side of the equi-join."""
    if os.environ.get("SPARK_GRAFT_WINDOW_CAPS", "1") == "1":
        def cap(side: DataFrame) -> DataFrame:
            w = Window.partitionBy(*keys)
            return (
                side.withColumn("__bc", F.count(F.lit(1)).over(w))
                .where(F.col("__bc") <= max_block_size)
                .drop("__bc")
            )

        return cap(a), cap(b)
    a = a.localCheckpoint(eager=False)
    b = b.localCheckpoint(eager=False)
    u = (
        a.select(*keys).withColumn("__side", F.lit("a"))
        .unionByName(b.select(*keys).withColumn("__side", F.lit("b")))
    )
    hot = (
        u.groupBy(*keys, "__side").count()
        .where(F.col("count") > max_block_size)
        .select(*keys).distinct()
    )
    hot = F.broadcast(hot)
    return (a.join(hot, keys, "left_anti"), b.join(hot, keys, "left_anti"))


def exact_blocks(clean: DataFrame, dirty: DataFrame, key_exprs: dict[str, Column] | None = None,
                 max_block_size: int = 100) -> DataFrame:
    """Equi-join candidates on each normalized key (reference's single-field
    blocking unions, `utils.R:548-586`).

    SINGLE PASS over each side for ALL key families: one projection
    explodes (kname, bkey) structs, then one hot-key cap and ONE
    equi-join on (kname, bkey) replace the per-key pipelines — the same
    pairs, with one scan of each input instead of one per key and ~4×
    fewer serial job launches (checkpoint/broadcast barriers)."""
    if key_exprs is None:
        key_exprs = {
            "url_norm": normalize_url("url"),
            # pre-truncate before the whitespace-collapse regex: the key is
            # 24 chars, so running the regex over the full multi-KB text
            # burns ~3x the whole strategy's cost for bytes the key never
            # sees (measured 28s -> 10s at 240k rows). 1000 raw chars
            # always cover 24 collapsed chars unless a text opens with
            # >976 whitespace chars — and such a text has no meaningful
            # 24-char prefix to block on anyway.
            "text_prefix": F.substring(
                F.regexp_replace(F.substring("text", 1, 1000), r"\s+", " "),
                1, 24),
        }

    def keyed(side: DataFrame, rid_col: str, alias: str) -> DataFrame:
        structs = F.array(*[
            F.struct(F.lit(name).alias("kname"), expr.alias("bkey"))
            for name, expr in key_exprs.items()
        ])
        return (
            side.select(F.col(rid_col).alias(alias), F.explode(structs).alias("kb"))
            .select(alias, F.col("kb.kname").alias("kname"),
                    F.col("kb.bkey").alias("bkey"))
            .where(F.col("bkey").isNotNull() & (F.length("bkey") > 0))
        )

    a, b = _cap_blocks_two_sided(keyed(clean, "url", "rid_a"),
                                 keyed(dirty, "rid", "rid_b"),
                                 ["kname", "bkey"], max_block_size)
    return (
        a.join(b, ["kname", "bkey"])
        .select("rid_a", "rid_b",
                F.concat(F.lit("exact:"), F.col("kname")).alias("block"))
    )


def sorted_neighborhood_blocks(clean: DataFrame, dirty: DataFrame,
                               sort_expr: Column | None = None,
                               window: int = 3) -> DataFrame:
    """Sorted-neighborhood: union both sides, range-sort on the key, pair
    rows within ``window`` positions across sides.

    Spark's ``row_number`` over a global order requires a single-partition
    window — instead we band by ``floor(rank / window)`` computed from a
    range-partitioned sort (zipWithIndex-style via partition offsets would
    also work); adjacent bands are joined so every ≤window neighborhood is
    covered by (band, band+1).
    """
    if sort_expr is None:
        sort_expr = normalize_url("url")
    a = clean.select(F.col("url").alias("rid"), sort_expr.alias("skey"),
                     F.lit("a").alias("side"))
    b = dirty.select(F.col("rid").alias("rid"), sort_expr.alias("skey"),
                     F.lit("b").alias("side"))
    u = a.unionByName(b)
    # DISTRIBUTED global rank (zipWithIndex pattern, shared helper): a
    # bare Window.orderBy would compute the whole ranking in ONE task.
    # The rank is partitioning-independent: (skey, side, rid) is a total
    # order.
    from rlerrorgenerator_spark.functions.rank import global_rank

    ranked = global_rank(u, ["skey", "side", "rid"], out_col="rn")
    # Neighborhood pairing via DENSE-RANK BLOCKS + lag windows, not a
    # banded self-join: rn is dense (1..n), so blocks of B consecutive
    # ranks have exactly B rows (last block excepted) and a pair at rank
    # distance ≤ window either sits inside one block or straddles one
    # boundary — replicating each block's last `window` rows into the
    # next block's stream makes the per-block lag window see EXACTLY the
    # same pair set as the former |rn_a − rn_b| ≤ window band join
    # (whose |band| ≤ 1 condition was implied), at ONE hash shuffle on
    # the block id instead of three shifted join shuffles. B >> window
    # bounds replication overhead at window/B per row; blocks stay small
    # enough (~8k rows) that AQE keeps many tasks in flight at any core
    # count.
    B = 8192
    blk = ranked.withColumn("__bid",
                            ((F.col("rn") - 1) / B).cast("long"))
    tails = blk.where((F.col("rn") - 1) % B >= B - window) \
               .withColumn("__bid", F.col("__bid") + 1)
    stream = blk.unionByName(tails)
    ws = Window.partitionBy("__bid").orderBy("rn")
    prev = F.array(*[
        F.lag(F.struct("rid", "side"), i).over(ws)
        for i in range(1, window + 1)
    ])
    pairs = (
        stream.withColumn("__prev", prev)
        .select("rid", "side", F.explode("__prev").alias("p"))
        .where(F.col("p").isNotNull() & (F.col("p.side") != F.col("side")))
        .select(
            F.when(F.col("side") == "a", F.col("rid"))
            .otherwise(F.col("p.rid")).alias("rid_a"),
            F.when(F.col("side") == "a", F.col("p.rid"))
            .otherwise(F.col("rid")).alias("rid_b"),
            F.lit("snm").alias("block"),
        )
    )
    return pairs.dropDuplicates(["rid_a", "rid_b"])


def minhash_signature(df: DataFrame, text_col: str, id_col: str,
                      n_hashes: int = 16, shingle_k: int = 5,
                      seed: int = 1) -> DataFrame:
    """MinHash signature per row: min over shingles of xxhash64(salt_i, s)
    for each of n_hashes salts. All built-in expressions.

    Shape: explode shingles -> ONE groupBy with n_hashes min-aggregates.
    The array-expression formulation (array_min(transform(...)) per hash)
    looks shuffle-free but Catalyst's projection collapse inlines the
    shingle construction into every one of the n_hashes expressions,
    recomputing it 16x per row — measured 122s vs ~10s at 80k rows. The
    min-aggs combine map-side so the exploded shuffle stays small.

    Universal-hashing trick: ONE xxhash64 over the shingle *string*, then
    each of the n_hashes functions derives by re-hashing that 8-byte long
    — string bytes are read once, not n_hashes times. Long-to-long xxhash
    keeps it overflow-safe under ANSI mode (an affine multiply would
    throw on overflow).

    Shingling shape: project the token split as a bound attribute, explode
    POSITIONS, then slice+concat per position-row. Building shingle
    arrays with array_distinct is O(tokens²) in string compares (measured
    112s for 12M shingles vs 1.3s this way) — and MinHash doesn't need
    distinct: min over a multiset equals min over its set."""
    k = max(2, shingle_k - 1)  # word shingles (see _shingles rationale)
    if os.environ.get("SPARK_GRAFT_ARROW_KERNELS", "1") != "0":
        # Vectorized fast path (functions/arrowhash.py): the expression
        # form below is ~18 interpreted HOF passes per row (ArrayTransform
        # is CodegenFallback — JFR measured it at ~35% of the 4-core
        # scaling leg's samples together with the scoring transforms).
        # One mapInArrow computes token hashes, shingle hashes and all
        # n_hashes segment-mins as numpy passes over the Arrow buffers.
        from pyspark.sql.types import LongType, StructField, StructType

        from rlerrorgenerator_spark.functions.arrowhash import (
            minhash_signature_batches,
        )

        pre = df.select(F.col(id_col).alias("__id"),
                        F.coalesce(text_col, F.lit("")).alias("__text"))
        out_schema = StructType(
            [pre.schema.fields[0]]
            + [StructField(f"mh_{i}", LongType(), True)
               for i in range(n_hashes)]
        )
        return pre.mapInArrow(
            lambda it: minhash_signature_batches(
                it, text_col="__text", n_hashes=n_hashes,
                shingle_k=k, seed=seed),
            out_schema,
        )
    # STRING-FREE, SHUFFLE-FREE signatures: hash tokens once, build the
    # per-row shingle-hash array (multi-arg xxhash64 over k consecutive
    # token hashes — no slice/concat string building), then each of the
    # n_hashes signature values is an array_min over a per-hash rehash of
    # that BOUND array. Zero shuffle, perfect cache locality per row —
    # the earlier explode → groupBy(id) form built ~32MB hash-agg maps
    # per task (LLC-thrashing at high parallelism), and the historic
    # warning about the array-expression form applied to STRING shingle
    # construction being inlined n_hashes times; with 8-byte hash
    # elements the rehash is ~10ns/element.
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.transform(
            # split directly on the whitespace-run pattern — one regex
            # pass instead of collapse-then-split (identical token arrays,
            # verified empirically; ~30% cheaper at 240k rows)
            F.split(F.lower(text_col), r"\s+"),
            lambda t: F.xxhash64(t),
        ).alias("__th"),
    )
    n = F.greatest(F.size("__th") - F.lit(k - 1), F.lit(1))
    sh = toks.withColumn(
        "__sh",
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.xxhash64(
                F.lit(f"mh{seed}"),
                *[F.try_element_at(F.col("__th"), i + j) for j in range(k)],
            ),
        ),
    )
    return sh.select(
        "__id",
        *[
            F.array_min(
                F.transform(F.col("__sh"), lambda h, i=i: F.xxhash64(F.lit(i), h))
            ).alias(f"mh_{i}")
            for i in range(n_hashes)
        ],
    )


def minhash_blocks(clean: DataFrame, dirty: DataFrame, text_col: str = "text",
                   n_hashes: int = 16, bands: int = 8, shingle_k: int = 5,
                   seed: int = 1, max_block_size: int = 200) -> DataFrame:
    """MinHash-LSH banding: rows agreeing on all rows of any band become
    candidates. bands × rows_per_band = n_hashes; with 8 bands × 2 rows a
    pair at Jaccard s collides w.p. 1−(1−s²)⁸ (≥0.99 for s≥0.6)."""
    rows_per_band = n_hashes // bands
    sig_a = minhash_signature(clean.select(F.col("url").alias("rid"), text_col),
                              text_col, "rid", n_hashes, shingle_k, seed)
    sig_b = minhash_signature(dirty.select("rid", text_col),
                              text_col, "rid", n_hashes, shingle_k, seed)

    def band_keys(sig: DataFrame, rid_alias: str) -> DataFrame:
        # ONE explode over an array of (band, bkey) structs — a per-band
        # union would re-evaluate the whole signature aggregation subtree
        # once per band (8× the cost; Catalyst does not share it across
        # union branches).
        structs = F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)],
                ).alias("bkey"),
            )
            for b in range(bands)
        ])
        return sig.select(
            F.col("__id").alias(rid_alias), F.explode(structs).alias("bk")
        ).select(rid_alias, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))

    # (band, bkey) grouping ≡ bkey grouping here (bkey is band-salted),
    # and the two-sided cap needs one count + one broadcast for both sides
    ka, kb = _cap_blocks_two_sided(band_keys(sig_a, "rid_a"),
                                   band_keys(sig_b, "rid_b"),
                                   ["band", "bkey"], max_block_size)
    return (
        ka.join(kb, ["band", "bkey"])
        .select("rid_a", "rid_b", F.lit("minhash").alias("block"))
        .dropDuplicates(["rid_a", "rid_b"])
    )


def minhash_blocks_verified(clean: DataFrame, dirty: DataFrame,
                            text_col: str = "text", n_hashes: int = 12,
                            bands: int = 6, shingle_k: int = 5,
                            max_block_size: int = 200) -> DataFrame:
    """MinHash-LSH blocking in VERIFICATION mode: the same plan shape as
    :func:`minhash_blocks` (per-side signatures → one band-struct explode
    → band equi-join → hot-bucket cap → pair dedup), but hashing with the
    md5-u64 discipline of ``plans.dedup.minhash_signatures`` so an
    independent SQL engine reproduces every bucket key bit-identically.
    The xxhash fast path stays the production blocking; this variant is
    what the driver's cross-engine oracle exercises (``er_blocking_minhash``).

    The hot-bucket cap groups on (band, bkey) — the md5 band keys carry
    no band salt, so capping on ``bkey`` alone (safe for the salted
    xxhash keys) could conflate buckets across bands here."""
    from rlerrorgenerator_spark.plans.dedup import minhash_signatures

    rows_per_band = n_hashes // bands
    sig_a = minhash_signatures(
        clean.select(F.col("url").alias("rid"), text_col),
        text_col, "rid", n_hashes, shingle_k)
    sig_b = minhash_signatures(
        dirty.select("rid", text_col), text_col, "rid", n_hashes, shingle_k)

    def band_keys(sig: DataFrame, rid_alias: str) -> DataFrame:
        structs = F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws("|", *[
                    F.col(f"mh_{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ]).alias("bkey"),
            )
            for b in range(bands)
        ])
        return sig.select(
            F.col("id").alias(rid_alias), F.explode(structs).alias("bk")
        ).select(rid_alias, F.col("bk.band").alias("band"),
                 F.col("bk.bkey").alias("bkey"))

    def cap(keyed: DataFrame) -> DataFrame:
        # per-key count window, same discipline as _cap_blocks_two_sided's
        # default form: single consumer of the signature plan (no
        # double-evaluation trap, no localCheckpoint needed), no driver
        # broadcast build, and the window's (band, bkey) exchange is the
        # exact partitioning the bucket join consumes — one Exchange per
        # side in the dumped plan
        w = Window.partitionBy("band", "bkey")
        return (
            keyed.withColumn("__bc", F.count(F.lit(1)).over(w))
            .where(F.col("__bc") <= max_block_size)
            .drop("__bc")
        )

    ka = cap(band_keys(sig_a, "rid_a"))
    kb = cap(band_keys(sig_b, "rid_b"))
    return (
        ka.join(kb, ["band", "bkey"])
        .groupBy("rid_a", "rid_b")
        .agg(F.count("*").alias("n_bands"))
    )


def build_candidates(clean: DataFrame, dirty: DataFrame,
                     use_exact: bool = True, use_snm: bool = True,
                     use_minhash: bool = True, snm_window: int = 3,
                     minhash_hashes: int = 16, minhash_bands: int = 8,
                     max_block_size: int = 200) -> DataFrame:
    """Union of all blocking strategies, deduped to (rid_a, rid_b).

    ``block`` keeps the first strategy that produced the pair (for
    diagnostics); dedup is a groupBy on the pair key — map-side partial
    aggregation keeps the shuffle small.
    """
    parts = []
    if use_exact:
        parts.append(exact_blocks(clean, dirty, max_block_size=max_block_size))
    if use_snm:
        parts.append(sorted_neighborhood_blocks(clean, dirty, window=snm_window))
    if use_minhash:
        parts.append(minhash_blocks(clean, dirty, n_hashes=minhash_hashes,
                                    bands=minhash_bands,
                                    max_block_size=max_block_size))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("rid_a", "rid_b").agg(F.min("block").alias("block"))
