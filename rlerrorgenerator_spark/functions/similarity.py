"""String-distance functions for pairwise scoring.

The reference scores pairs with stringdist's osa/lv/dl/jw/soundex
(`/root/reference/benchmarking/utils.R:168-187` ``string_dist_norm``,
normalized by max length). Spark mapping:

- Levenshtein → built-in ``F.levenshtein`` (JVM, codegen) — the hot path.
- Soundex → built-in ``F.soundex``.
- Jaro-Winkler (p=0.1, matching stringdist's default used at
  `utils.R:180-187`) → implemented here in pure numpy-backed Python and
  exposed as an Arrow-batched pandas UDF (rapidfuzz/jellyfish are not in
  the environment; at 100 TB this UDF runs inside applyInPandas batches,
  never per-row).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity in [0,1]."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    return (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler similarity (stringdist-compatible p=0.1 default)."""
    jw = jaro(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1[:max_prefix], s2[:max_prefix]):
        if c1 != c2:
            break
        prefix += 1
    return jw + prefix * p * (1.0 - jw)


def jaro_winkler_udf(c1: Column, c2: Column, p: float = 0.1) -> Column:
    """Arrow-batched pandas UDF column: 1 − JW similarity = JW *distance*
    (the reference reports distances, `utils.R:180-187`)."""

    @F.pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        out = [
            1.0 - jaro_winkler(str(x), str(y), p) if x is not None and y is not None else None
            for x, y in zip(a.to_numpy(), b.to_numpy())
        ]
        return pd.Series(out, dtype="float64")

    return _jw(c1, c2)


def norm_levenshtein(c1: Column, c2: Column) -> Column:
    """Levenshtein distance normalized by max length (JVM built-in;
    `utils.R:168-178` ``string_dist_norm`` with method='lv')."""
    return (
        F.levenshtein(c1, c2).cast("double")
        / F.greatest(F.length(c1), F.length(c2), F.lit(1)).cast("double")
    )
