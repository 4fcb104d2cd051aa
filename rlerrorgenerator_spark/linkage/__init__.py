"""Record-linkage pipeline: blocking → scoring → resolution → metrics."""

from rlerrorgenerator_spark.linkage.blocking import (
    build_candidates,
    exact_blocks,
    minhash_blocks,
    normalize_url,
    sorted_neighborhood_blocks,
)
from rlerrorgenerator_spark.linkage.features import score_pairs
from rlerrorgenerator_spark.linkage.resolve import connected_components, find_best_links
from rlerrorgenerator_spark.linkage.metrics import pairwise_metrics

__all__ = [
    "normalize_url",
    "exact_blocks",
    "sorted_neighborhood_blocks",
    "minhash_blocks",
    "build_candidates",
    "score_pairs",
    "find_best_links",
    "connected_components",
    "pairwise_metrics",
]
