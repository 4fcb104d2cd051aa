"""Edit-distance error transforms: indel, repl, tpose.

Reference semantics (`/root/reference/R/2_edit_distance_errors.R`):

- ``indel`` (`:5-93`): with p=0.5 insert a random charset char at a uniform
  position, else delete a uniform position; only non-empty values eligible.
- ``repl`` (`:99-180`): replace one uniform position with a *different*
  random charset char (rejection loop). Our extension (north star):
  ``charset='keyboard'|'ocr'`` replaces via a confusion map of the char at
  the chosen position.
- ``tpose`` (`:182-276`): swap two adjacent differing chars at a random
  eligible position; rows need >1 distinct char (`tpose_eligible`,
  `:182-192`).

All three share one shape: seeded per-row string surgery inside an
Arrow-batched pandas UDF (the scalar R cores `indel.default`/`repl.default`
/`tpose.base` are row-at-a-time `map_chr` loops — the slow path we never
take). Determinism: each row's RNG is keyed on (seed, stage, rid), so the
result is independent of partitioning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from rlerrorgenerator_spark.operators.base import (
    KEY,
    apply_cell_edit,
    register,
    select_rows,
    split_across_cols,
)
from rlerrorgenerator_spark.operators.charsets import CHARSETS, CONFUSION_MAPS
from rlerrorgenerator_spark.rng import row_rng


def _resolve_charset(charset: str) -> tuple[str | None, dict[str, str] | None]:
    if charset in CONFUSION_MAPS:
        return None, CONFUSION_MAPS[charset]
    return CHARSETS.get(charset, charset), None


def _make_udf(fn, seed: int, stage: str):
    """Wrap a scalar (rng, str) -> str editor as an Arrow-batched pandas UDF
    over (rid, value); per-row RNG keyed on (seed, stage, rid)."""
    @F.pandas_udf("string")
    def udf(rid: pd.Series, val: pd.Series) -> pd.Series:
        out = []
        for k, v in zip(rid.to_numpy(), val.to_numpy()):
            if v is None:
                out.append(None)
                continue
            out.append(fn(row_rng(str(k), seed, stage), str(v)))
        return pd.Series(out, dtype="object")

    return udf


def _make_udf_flagged(fn, seed: int, stage: str):
    """Flag-gated variant for the inline (Bernoulli) path: Spark evaluates
    pandas UDFs under when() unconditionally, so the selection flag is an
    input and unselected rows skip the (hash+rng) work entirely."""
    @F.pandas_udf("string")
    def udf(rid: pd.Series, val: pd.Series, flag: pd.Series) -> pd.Series:
        out = []
        for k, v, f in zip(rid.to_numpy(), val.to_numpy(), flag.to_numpy()):
            if not f or v is None:
                out.append(v)
                continue
            out.append(fn(row_rng(str(k), seed, stage), str(v)))
        return pd.Series(out, dtype="object")

    return udf


def _apply_editor(df, col, scalar_fn, error_name, per_col, seed, st, ts,
                  exact, rate, eligible):
    """Shared skeleton: selection (exact-k DataFrame or inline predicate)
    + UDF wiring + apply_cell_edit."""
    sel = select_rows(df, eligible, per_col, seed, st, exact, rate)
    if isinstance(sel, Column):
        udf = _make_udf_flagged(scalar_fn, seed, st)
        new_value = udf(F.col(KEY), F.col(col), F.col("__sel"))
    else:
        udf = _make_udf(scalar_fn, seed, st)
        new_value = udf(F.col(KEY), F.col(col))
    return apply_cell_edit(df, col, sel, new_value, error_name, ts)


def _indel_one(rng, s: str, charset: str) -> str:
    # p=0.5 insert vs delete (`R/2_edit_distance_errors.R:66-93`); a
    # 1-char string always gets an insert (delete would empty it — the
    # reference guards eligibility on non-empty only, we keep len>=1).
    do_insert = bool(rng.random() < 0.5) or len(s) <= 1
    if do_insert:
        pos = int(rng.integers(0, len(s) + 1))
        ch = charset[int(rng.integers(0, len(charset)))]
        return s[:pos] + ch + s[pos:]
    pos = int(rng.integers(0, len(s)))
    return s[:pos] + s[pos + 1:]


def _repl_one(rng, s: str, charset: str | None, confusion: dict[str, str] | None) -> str:
    if not s:
        return s
    if confusion is not None:
        # keyboard/OCR variant: only positions with a mapped char eligible.
        positions = [i for i, c in enumerate(s) if c in confusion]
        if not positions:
            return s
        pos = positions[int(rng.integers(0, len(positions)))]
        cands = confusion[s[pos]]
        ch = cands[int(rng.integers(0, len(cands)))]
        return s[:pos] + ch + s[pos + 1:]
    pos = int(rng.integers(0, len(s)))
    # rejection loop: replacement must differ (`R/2_edit:171-178`)
    for _ in range(32):
        ch = charset[int(rng.integers(0, len(charset)))]
        if ch != s[pos]:
            return s[:pos] + ch + s[pos + 1:]
    return s


def _tpose_one(rng, s: str) -> str:
    # positions where adjacent chars differ (`R/2_edit:244-276`)
    positions = [i for i in range(len(s) - 1) if s[i] != s[i + 1]]
    if not positions:
        return s
    pos = positions[int(rng.integers(0, len(positions)))]
    return s[:pos] + s[pos + 1] + s[pos] + s[pos + 2:]


@register("indel")
def indel(df: DataFrame, lineage: DataFrame, n_errors: int, col_names: list[str],
          *, seed: int, stage: str, ts: int, charset: str = "letters",
          exact: bool = True, rate: float | None = None):
    """Insert-or-delete one char (`R/2_edit_distance_errors.R:5-93`)."""
    per_col = split_across_cols(n_errors, len(col_names))
    cs, _ = _resolve_charset(charset)
    lineages = []
    for col in col_names:
        st = f"{stage}|indel|{col}"
        eligible = F.col(col).isNotNull() & (F.length(col) > 0)
        df, ln = _apply_editor(df, col, lambda rng, s, cs=cs: _indel_one(rng, s, cs),
                               "indel", per_col, seed, st, ts, exact, rate, eligible)
        lineages.append(ln)
    return df, _union(lineages)


@register("repl")
def repl(df: DataFrame, lineage: DataFrame, n_errors: int, col_names: list[str],
         *, seed: int, stage: str, ts: int, charset: str = "letters",
         exact: bool = True, rate: float | None = None):
    """Replace one char with a different one (`R/2_edit:99-180`); with
    ``charset='keyboard'|'ocr'`` replacement follows a confusion map."""
    per_col = split_across_cols(n_errors, len(col_names))
    cs, confusion = _resolve_charset(charset)
    lineages = []
    for col in col_names:
        st = f"{stage}|repl|{col}"
        eligible = F.col(col).isNotNull() & (F.length(col) > 0)
        if confusion is not None:
            # only rows containing a confusable char are eligible
            pat = "[" + "".join(sorted(set(confusion))).replace("\\", "\\\\").replace("]", "\\]") + "]"
            eligible = eligible & F.col(col).rlike(pat)
        name = "repl" if confusion is None else f"repl_{charset}"
        df, ln = _apply_editor(
            df, col, lambda rng, s, cs=cs, cf=confusion: _repl_one(rng, s, cs, cf),
            name, per_col, seed, st, ts, exact, rate, eligible,
        )
        lineages.append(ln)
    return df, _union(lineages)


@register("tpose")
def tpose(df: DataFrame, lineage: DataFrame, n_errors: int, col_names: list[str],
          *, seed: int, stage: str, ts: int, exact: bool = True,
          rate: float | None = None):
    """Transpose two adjacent differing chars (`R/2_edit:199-276`)."""
    per_col = split_across_cols(n_errors, len(col_names))
    lineages = []
    for col in col_names:
        st = f"{stage}|tpose|{col}"
        # tpose_eligible (`R/2_edit:182-192`): >1 distinct character. A
        # cheap JVM-side proxy: length>1 AND not all chars equal (string
        # differs from its first char repeated).
        eligible = (
            F.col(col).isNotNull()
            & (F.length(col) > 1)
            & (F.col(col) != F.expr(f"repeat(substring({col}, 1, 1), length({col}))"))
        )
        df, ln = _apply_editor(df, col, lambda rng, s: _tpose_one(rng, s),
                               "tpose", per_col, seed, st, ts, exact, rate, eligible)
        lineages.append(ln)
    return df, _union(lineages)


def _union(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
