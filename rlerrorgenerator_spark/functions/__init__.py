"""Scalar/vectorized function library: string similarity, text analysis."""

from rlerrorgenerator_spark.functions.similarity import (
    jaro_winkler,
    jaro_winkler_udf,
    norm_levenshtein,
)

__all__ = ["jaro_winkler", "jaro_winkler_udf", "norm_levenshtein"]
