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


def jaro_winkler_np(a_list, b_list, p: float = 0.1,
                    max_prefix: int = 4):
    """Batch Jaro-Winkler over two equal-length string sequences,
    vectorized ACROSS pairs in numpy (the per-pair greedy matching loop
    of ``jaro`` runs as L1 sweeps of (batch × L2) boolean algebra instead
    of a Python char loop per pair). Bit-identical to the scalar
    ``jaro_winkler`` (same IEEE op order; property-tested) — this is the
    "batched, never per-row Python" scoring form the pipeline ships.
    Returns a float64 ndarray of similarities; None inputs are the
    caller's problem (filter first)."""
    import numpy as np

    n = len(a_list)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    la = np.fromiter((len(s) for s in a_list), np.int64, n)
    lb = np.fromiter((len(s) for s in b_list), np.int64, n)
    L1 = max(int(la.max()), 1)
    L2 = max(int(lb.max()), 1)
    A = np.zeros((n, L1), np.uint32)
    B = np.zeros((n, L2), np.uint32)
    for i, s in enumerate(a_list):
        if s:
            A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    for i, s in enumerate(b_list):
        if s:
            B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)

    wm = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    j_idx = np.arange(L2)[None, :]
    flags1 = np.zeros((n, L1), bool)
    flags2 = np.zeros((n, L2), bool)
    rows = np.arange(n)
    for i in range(L1):
        active = i < la
        if not active.any():
            break
        c = A[:, i : i + 1]
        lo = np.maximum(0, i - wm)[:, None]
        hi = np.minimum(lb, i + wm + 1)[:, None]
        eq = (B == c) & ~flags2 & (j_idx >= lo) & (j_idx < hi) & active[:, None]
        has = eq.any(axis=1)
        j1 = eq.argmax(axis=1)
        flags2[rows[has], j1[has]] = True
        flags1[:, i] = has
    m = flags1.sum(axis=1)

    # transpositions: matched chars of s1 in i-order vs s2 in j-order
    maxm = max(int(m.max()), 1)
    pos1 = np.cumsum(flags1, axis=1) - 1
    pos2 = np.cumsum(flags2, axis=1) - 1
    S1 = np.zeros((n, maxm), np.uint32)
    S2 = np.zeros((n, maxm), np.uint32)
    r1, c1_ = np.nonzero(flags1)
    S1[r1, pos1[flags1]] = A[r1, c1_]
    r2, c2_ = np.nonzero(flags2)
    S2[r2, pos2[flags2]] = B[r2, c2_]
    k_idx = np.arange(maxm)[None, :]
    t = (((S1 != S2) & (k_idx < m[:, None])).sum(axis=1) // 2).astype(np.float64)

    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro_v = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro_v = np.where(m == 0, 0.0, jaro_v)

    # winkler boost: common prefix up to first mismatch, capped at 4
    kpre = min(max_prefix, L1, L2)
    if kpre > 0:
        pre_eq = (A[:, :kpre] == B[:, :kpre]) & (
            np.arange(kpre)[None, :] < np.minimum(la, lb)[:, None]
        )
        prefix = np.cumprod(pre_eq, axis=1).sum(axis=1).astype(np.float64)
    else:
        prefix = np.zeros(n, np.float64)
    jw = jaro_v + prefix * p * (1.0 - jaro_v)

    # scalar parity: exact equality (including "" == "") short-circuits
    # to 1.0 (rows with la == lb fit entirely in min(L1, L2) columns, so
    # the padded comparison below is complete for them)
    minL = min(L1, L2)
    eq_all = (la == lb) & (
        (A[:, :minL] == B[:, :minL])
        | (np.arange(minL)[None, :] >= la[:, None])
    ).all(axis=1)
    return np.where(eq_all, 1.0, jw)


def jaro_winkler_udf(c1: Column, c2: Column, p: float = 0.1) -> Column:
    """Arrow-batched pandas UDF column: 1 − JW similarity = JW *distance*
    (the reference reports distances, `utils.R:180-187`). The batch is
    scored by ``jaro_winkler_np`` — numpy across the whole Arrow batch,
    no per-row Python."""

    @F.pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        ok = (a.notna() & b.notna()).to_numpy()
        av, bv = a.to_numpy(), b.to_numpy()
        sims = np.full(len(av), np.nan)
        if ok.any():
            sims[ok] = jaro_winkler_np(
                [str(x) for x in av[ok]], [str(y) for y in bv[ok]], p)
        # distance = 1 − similarity; null inputs stay NaN (same as the
        # previous per-row form: None in a float64 Series is NaN)
        return pd.Series(1.0 - sims, dtype="float64")

    return _jw(c1, c2)


def norm_levenshtein(c1: Column, c2: Column) -> Column:
    """Levenshtein distance normalized by max length (JVM built-in;
    `utils.R:168-178` ``string_dist_norm`` with method='lv')."""
    return (
        F.levenshtein(c1, c2).cast("double")
        / F.greatest(F.length(c1), F.length(c2), F.lit(1)).cast("double")
    )


def norm_levenshtein_capped(c1: Column, c2: Column, threshold: int) -> Column:
    """``norm_levenshtein`` for GATED consumers: any normalized distance
    whose raw edit count exceeds ``threshold`` behaves identically to 1.0
    downstream (the score's content gates cut off at 0.25 × a 64-char
    prefix = 16 edits), so the bounded built-in — O(n·threshold) with
    early exit instead of the full O(n·m) DP table — computes the same
    score. Spark's UTF8String byte-walking in the three per-pair
    Levenshtein calls measured ~27% of the 4-core scaling leg's
    execution samples (JFR)."""
    lev = F.levenshtein(c1, c2, threshold)
    return F.when(lev < 0, F.lit(1.0)).otherwise(
        lev.cast("double")
        / F.greatest(F.length(c1), F.length(c2), F.lit(1)).cast("double")
    )


def osa_distance(s1: str, s2: str) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment) —
    stringdist's ``method='osa'``/``'dl'`` as used by the reference's
    scoring (`/root/reference/benchmarking/utils.R:168-187,223-226`).

    Differs from plain Levenshtein exactly on adjacent transpositions
    (the ``tpose`` error operator's output): osa("paer","pear")=1,
    lev=2."""
    if s1 == s2:
        return 0
    l1, l2 = len(s1), len(s2)
    if not l1:
        return l2
    if not l2:
        return l1
    prev2: list[int] | None = None
    prev = list(range(l2 + 1))
    for i in range(1, l1 + 1):
        cur = [i] + [0] * l2
        c1 = s1[i - 1]
        for j in range(1, l2 + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            best = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (i > 1 and j > 1 and c1 == s2[j - 2] and s1[i - 2] == s2[j - 1]
                    and prev2 is not None):
                best = min(best, prev2[j - 2] + 1)
            cur[j] = best
        prev2, prev = prev, cur
    return prev[l2]


def osa_udf(c1: Column, c2: Column, normalize: bool = True) -> Column:
    """Arrow-batched pandas UDF column: OSA distance, optionally
    normalized by max length (``string_dist_norm`` semantics). Per-row DP
    inside the Arrow batch — the same batching contract as the JW UDF;
    name/url operands are short so the DP is O(len²) on tiny lengths."""

    @F.pandas_udf("double")
    def _osa(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a.to_numpy(), b.to_numpy()):
            if x is None or y is None:
                out.append(None)
                continue
            x, y = str(x), str(y)
            d = float(osa_distance(x, y))
            if normalize:
                d /= max(len(x), len(y), 1)
            out.append(d)
        return pd.Series(out, dtype="float64")

    return _osa(c1, c2)
