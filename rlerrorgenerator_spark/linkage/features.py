"""Pairwise feature extraction + deterministic match scoring.

Reference: ``add_feature_vector`` (`/root/reference/benchmarking/utils.R:189-311`)
computes 23 ``metric_*`` features per candidate pair (name dl/jw/soundex
distances, dob component distances, swap flags, gender/race composition),
then a trained model thresholds match probability at 0.5
(`utils.R:362-364,1006`). The reference's own threshold features
(`utils.R:606-617`: jw<0.15 per name + ≥2 dob component agreements) show
the shape a deterministic scorer needs — that is what we ship (ML
optional, not required by the north rule).

Pages-domain feature family (SURVEY.md §7.5):

- jw + normalized-lev on the normalized url (name analogue);
- normalized-lev on a text prefix + token Jaccard on text (content);
- length ratio, lang equality (the gender/race-style categorical);
- warc_ts delta in days (dob analogue).

Everything except JW is built-in (codegen); JW is one Arrow-batched
pandas UDF over the (already blocked) pair table. At 100 TB the pair
table is repartitioned on the blocking key first so each Arrow batch is
one block (`SURVEY.md §4`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

from rlerrorgenerator_spark.functions.similarity import (
    jaro_winkler_udf,
    norm_levenshtein,
    norm_levenshtein_capped,
)
from rlerrorgenerator_spark.linkage.blocking import normalize_url


def _arrow_kernels_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_ARROW_KERNELS", "1") != "0"

PAIR_COLS = ["url", "lang", "warc_ts"]
TEXT_PREFIX = 64


def attach_pair_attrs(candidates: DataFrame, clean: DataFrame, dirty: DataFrame,
                      exact_shingles: bool = False) -> DataFrame:
    """Widen (rid_a, rid_b) with _a/_b suffixed attributes — the
    reference's ``attach_dbs_to_ids`` (`utils.R:152-162`).

    Shingle arrays are computed here, ONCE PER ROW on each side before the
    pair join — computing them inside the pair-level feature expressions
    would redo the array construction per candidate pair. They are stored
    as HASHED shingles (array<long>): 8-byte elements instead of ~25-byte
    strings through the join, and the later array_intersect/array_union
    compare longs, not strings. No array_distinct (O(n²) on big string
    arrays); intersect/union already emit set semantics.

    The sided projections are SLIM: full texts never enter the pair join
    — only the 64-char prefix, the length, and the hashed shingles
    (shipping whole page bodies through the pair shuffle measured ~GBs
    at 10^5 pairs and would be TBs at crawl scale)."""

    def sided(df: DataFrame, key_col: str, alias: str) -> DataFrame:
        k = 4
        if not exact_shingles and _arrow_kernels_enabled():
            # Vectorized fast path (functions/arrowhash.py): the three
            # HOF transforms + sample filter below are CodegenFallback —
            # interpreted, boxing, ~35% of the 4-core leg's execution
            # samples (JFR, round 4). One mapInArrow computes the sampled
            # 32-bit shingle payload in a handful of numpy passes; every
            # other _sided_select expression stays JVM codegen.
            from rlerrorgenerator_spark.functions.arrowhash import (
                sided_shingle_batches,
            )

            cols = list(dict.fromkeys([key_col, *PAIR_COLS]))  # url is both
            pre = df.select(
                *cols, F.coalesce("text", F.lit("")).alias("text"),
            )
            out_schema = StructType(
                pre.schema.fields
                + [StructField("__sh", ArrayType(IntegerType()), True),
                   StructField("__shs", BooleanType(), True)]
            )
            mapped = pre.mapInArrow(
                lambda it: sided_shingle_batches(it, text_col="text",
                                                 shingle_k=k),
                out_schema,
            )
            return _sided_select(mapped, key_col, alias,
                                 F.col("__sh"), F.col("__shs"))
        # STRING-FREE shingle hashing: hash each token once, then derive
        # the k-shingle hash from k consecutive token hashes with one
        # multi-arg xxhash64 — no slice/concat string building. Building
        # shingle STRINGS (concat_ws(slice(toks))) measured ~45s of a 55s
        # score stage at 60k rows; this form is pure long arithmetic over
        # a bound array attribute (no recompute inside the lambda).
        step = df.withColumn(
            "__toks__", F.split(F.coalesce("text", F.lit("")), " ")
        ).withColumn("__th__", F.transform(F.col("__toks__"), lambda t: F.xxhash64(t)))
        n = F.greatest(F.size("__th__") - F.lit(k - 1), F.lit(1))
        # try_element_at: docs shorter than k tokens yield nulls past the
        # end, which xxhash64 skips — same set semantics, no ANSI throw
        hashed = F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.xxhash64(*[F.try_element_at(F.col("__th__"), i + j)
                                   for j in range(k)]),
        )
        # Deterministic 1-in-4 shingle subsample (keep h % 4 == 0): when
        # BOTH sides are sampled the pair Jaccard over the samples is an
        # unbiased estimate of the true shingle Jaccard (MinHash-style
        # subsampling) — and the pair shuffle ships 4× fewer array bytes,
        # the dominant bandwidth cost of scoring.
        # Short documents keep the FULL array: near the 20-token body
        # floor a doc has ~17 shingles → ~4 sampled, a high-variance (or
        # empty → jaccard forced to 0) estimate exactly where the gated
        # content evidence matters most. Below 32 shingles the bandwidth
        # saving is noise anyway, so exact Jaccard costs nothing. A
        # ``shs_*`` flag records which form shipped so add_features can
        # symmetrize mixed full-vs-sampled pairs at the 32 boundary.
        if exact_shingles:
            # verification mode (the cross-engine e2e oracle): full
            # 64-bit shingle-hash sets, no subsample, no truncation —
            # |intersect|/|union| equals the exact string-shingle Jaccard
            # an independent engine computes (modulo ~2⁻⁶⁴ collisions)
            use_sample = F.lit(False)
            hashed_out = hashed
            return _sided_select(step, key_col, alias, hashed_out, use_sample)
        use_sample = F.size(hashed) >= 32
        # ship 32-bit shingle hashes through the pair shuffle: the arrays
        # are the dominant scoring-shuffle payload and truncating 64→32
        # bits halves those bytes; at ≤ ~400 shingles/doc the extra
        # collision probability is ~n²/2³³ ≈ 2e-5 — invisible next to the
        # 1-in-4 sampling variance the Jaccard estimate already carries.
        # shiftright(…, 32) keeps the (uniform) high word and always fits
        # int, so the cast cannot throw under ANSI. The 1-in-4 subsample
        # keys off the TRUNCATED value so add_features' mixed-pair
        # symmetrization (pmod over the shipped ints) selects exactly the
        # same elements the row-side filter kept.
        hashed32 = F.transform(hashed, lambda h: F.shiftright(h, 32).cast("int"))
        hashed_out = F.when(
            use_sample, F.filter(hashed32, lambda h: F.pmod(h, F.lit(4)) == 0)
        ).otherwise(hashed32)
        return _sided_select(step, key_col, alias, hashed_out, use_sample)

    a = sided(clean, "url", "a")
    b = sided(dirty, "rid", "b")
    return candidates.join(a, "rid_a").join(b, "rid_b")


def _sided_select(step: DataFrame, key_col: str, alias: str,
                  hashed_out, use_sample) -> DataFrame:
    return step.select(
        F.col(key_col).alias(f"rid_{alias}"),
        *[F.col(c).alias(f"{c}_{alias}") for c in PAIR_COLS],
        F.substring(F.coalesce("text", F.lit("")), 1, TEXT_PREFIX).alias(f"tp_{alias}"),
        F.length(F.coalesce("text", F.lit(""))).alias(f"tlen_{alias}"),
        hashed_out.alias(f"sh_{alias}"),
        use_sample.alias(f"shs_{alias}"),
    )


def add_features(pairs: DataFrame, exact_shingles: bool = False) -> DataFrame:
    """Compute the metric_* columns on a widened pair table."""
    un_a, un_b = normalize_url("url_a"), normalize_url("url_b")
    tp_a, tp_b = F.col("tp_a"), F.col("tp_b")
    # word-SHINGLE Jaccard, not unigram: corpora with small vocabularies
    # (e.g. templated/boilerplate web text) make unigram sets collide on
    # unrelated documents; 4-word shingles encode order and stay ~0 for
    # non-matches while 1-2 char edits only break a handful of shingles.
    # sh_a/sh_b are precomputed per row in attach_pair_attrs. Mixed pairs
    # (one side shipped full, the other 1-in-4 sampled — possible at the
    # 32-shingle boundary) are symmetrized by filtering the full side down
    # to the same h%4==0 sample, so the estimate stays unbiased instead of
    # comparing a sample against a full set (which biases Jaccard ~4× low).
    eff_a = F.when(
        F.col("shs_b") & ~F.col("shs_a"),
        F.filter(F.col("sh_a"), lambda h: F.pmod(h, F.lit(4)) == 0),
    ).otherwise(F.col("sh_a"))
    eff_b = F.when(
        F.col("shs_a") & ~F.col("shs_b"),
        F.filter(F.col("sh_b"), lambda h: F.pmod(h, F.lit(4)) == 0),
    ).otherwise(F.col("sh_b"))
    inter = F.size(F.array_intersect(eff_a, eff_b)).cast("double")
    if exact_shingles or not _arrow_kernels_enabled():
        union = F.size(F.array_union(eff_a, eff_b)).cast("double")
    else:
        # kernel-path arrays are already DEDUPED per side (arrowhash
        # emits sorted distinct values), so |a ∪ b| = |a| + |b| − |a ∩ b|
        # — array_union's second per-pair hash-set build is pure waste
        # (OpenHashSet get/rehash measured ~4% of the 4-core leg's JFR
        # samples). The exact_shingles oracle path keeps array_union:
        # its arrays carry duplicates and its DuckDB re-derivation
        # computes the set union.
        union = (F.size(eff_a) + F.size(eff_b)).cast("double") - inter
    fast = not exact_shingles and _arrow_kernels_enabled()
    if fast:
        # Bounded Levenshtein (early-exit O(n·t)) wherever the score's
        # consumers gate the value anyway — see norm_levenshtein_capped.
        # url_lev_abs: the score zeroes url evidence beyond 3 edits and
        # hard-gates at 2, so every value >3 is interchangeable; map the
        # bounded built-in's -1 overflow marker to 4.
        lv1 = F.levenshtein(un_a, un_b, 3)
        lv2 = F.levenshtein(F.lower("url_a"), F.lower("url_b"), 3)
        url_lev_abs = F.least(
            F.when(lv1 < 0, 4).otherwise(lv1),
            F.when(lv2 < 0, 4).otherwise(lv2),
        ).cast("double")
        # text/swap prefix distances are gated at 0.25 × the 64-char
        # prefix = 16 edits
        text_lev = norm_levenshtein_capped(tp_a, tp_b, 16)
        swap_lev = norm_levenshtein_capped(
            tp_a, F.substring(F.coalesce("lang_b", F.lit("")), 1, TEXT_PREFIX), 16)
    else:
        url_lev_abs = F.least(
            F.levenshtein(un_a, un_b),
            F.levenshtein(F.lower("url_a"), F.lower("url_b")),
        ).cast("double")
        text_lev = norm_levenshtein(tp_a, tp_b)
        swap_lev = norm_levenshtein(
            tp_a, F.substring(F.coalesce("lang_b", F.lit("")), 1, TEXT_PREFIX))
    return (
        pairs.withColumn("metric_url_jw", jaro_winkler_udf(un_a, un_b))
        .withColumn("metric_url_lev", norm_levenshtein(un_a, un_b))
        # min over normalized and raw forms: a char error landing inside
        # the scheme/"www." makes normalization strip one side but not the
        # other (lev 4-12 for what is really a 1-edit difference); the raw
        # comparison still sees 1 edit.
        .withColumn("metric_url_lev_abs", url_lev_abs)
        .withColumn("metric_text_lev", text_lev)
        # swap-flag analogue (`utils.R:250-254` fname↔lname swap): does the
        # dirty row's lang field hold the clean row's text?
        .withColumn("metric_swap_lev", swap_lev)
        .withColumn(
            "metric_text_jaccard",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "metric_len_ratio",
            F.least("tlen_a", "tlen_b").cast("double")
            / F.greatest(F.col("tlen_a"), F.col("tlen_b"), F.lit(1)).cast("double"),
        )
        .withColumn(
            "metric_lang_eq",
            F.when(F.col("lang_a").isNull() | F.col("lang_b").isNull(), 0.5)
            .when(F.col("lang_a") == F.col("lang_b"), 1.0)
            .otherwise(0.0),
        )
        .withColumn(
            "metric_ts_days",
            F.abs(
                F.unix_timestamp("warc_ts_a") - F.unix_timestamp("warc_ts_b")
            ).cast("double")
            / F.lit(86400.0),
        )
    )


def add_match_prob(feat: DataFrame) -> DataFrame:
    """Deterministic weighted score in [0,1], thresholded at 0.5 like the
    reference's model output (`utils.R:362-364`).

    Weights follow the reference's threshold-feature shape
    (`utils.R:606-617`): strong url agreement + strong content agreement
    ⇒ match; categorical (lang) and ts act as soft evidence. Design notes:

    - url similarity uses *absolute* edit distance (injected url errors
      are 1-2 edits; JW saturates on long shared url prefixes and cannot
      separate sibling pages of one host);
    - content similarity is the max over direct text similarity, token
      Jaccard, and the swap-repair similarity (text_a vs lang_b) so
      ``swap_fields``-errored rows still link.
    """
    url_sim = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.col("metric_url_lev_abs") / F.lit(3.0)
    )
    # content terms are GATED: weak similarity contributes zero rather than
    # a graded value — ungated prefix-lev similarity lets boilerplate-ish
    # sibling pages accumulate ~0.35 "content" evidence and tip over the
    # threshold (measured on the sf0.01 documents corpus).
    prefix_sim = F.when(
        F.col("metric_text_lev") <= 0.25, F.lit(1.0) - F.col("metric_text_lev")
    ).otherwise(F.lit(0.0))
    swap_sim = F.when(
        F.col("metric_swap_lev") <= 0.25, F.lit(1.0) - F.col("metric_swap_lev")
    ).otherwise(F.lit(0.0))
    jac_sim = F.when(
        F.col("metric_text_jaccard") >= 0.5, F.col("metric_text_jaccard")
    ).otherwise(F.lit(0.0))
    content_sim = F.greatest(prefix_sim, jac_sim, swap_sim)
    ts_sim = F.lit(1.0) / (F.lit(1.0) + F.col("metric_ts_days") / F.lit(30.0))
    # Hard url gate: injected url errors are single-char edits and the
    # near-dup twin suffix adds 2 — a true pair NEVER strays beyond 2-3
    # edits, while distinct entities with cloned content (mirror pages)
    # sit at arbitrary url distance. Without the gate, content-identical
    # mirrors are unseparable from true matches.
    gate = (F.col("metric_url_lev_abs") <= 2).cast("double")
    score = gate * (
        F.lit(0.45) * url_sim
        + F.lit(0.45) * content_sim
        + F.lit(0.05) * F.col("metric_lang_eq")
        + F.lit(0.05) * ts_sim
    )
    return feat.withColumn("match_prob", score).withColumn(
        "prediction", (F.col("match_prob") > 0.5).cast("boolean")
    )


def score_pairs(candidates: DataFrame, clean: DataFrame, dirty: DataFrame,
                exact_shingles: bool = False) -> DataFrame:
    """candidates (rid_a, rid_b, block) → scored pairs with metric_* +
    match_prob + prediction. Heavy payload columns (texts, shingle arrays)
    are dropped from the output — the scored table checkpoints lean.
    ``exact_shingles=True`` scores with full unsampled shingle sets
    (exact Jaccard; the cross-engine verification mode).

    Scored-output contract, Arrow-kernel fast path (the default,
    ``SPARK_GRAFT_ARROW_KERNELS`` unset or ``1``): the persisted distance
    metrics are CAPPED at their score gates — ``metric_url_lev_abs``
    saturates at 4 (the score zeroes url evidence beyond 3 edits) and
    ``metric_text_lev`` / ``metric_swap_lev`` report 1.0 for any raw
    prefix distance > 16 (the 0.25 × 64-char gate). ``match_prob`` and
    ``prediction`` are provably unchanged by the caps (every consumer
    gates below them), but anything downstream that treats these three
    columns as TRUE normalized distances must either use the
    ``exact_shingles``/expression path or tolerate the saturated range;
    a cross-mode diff of the scored table will show divergent metric
    values on capped pairs by design."""
    out = add_match_prob(add_features(
        attach_pair_attrs(candidates, clean, dirty, exact_shingles),
        exact_shingles))
    return out.drop("sh_a", "sh_b", "shs_a", "shs_b", "tp_a", "tp_b")
