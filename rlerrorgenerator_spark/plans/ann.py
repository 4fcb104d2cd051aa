"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products with built-in ``zip_with``/``aggregate`` (JVM; no Python);
  top-k per query via a rank window over the blocked cross join.
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets
  shrink the candidate set; same scoring afterwards. Recall < 1 by
  construction; probe multiple hash tables to trade compute for recall.

At 10^12 × 10^12 this becomes IVF-style: cluster the corpus (k-means or
hash buckets), route queries to nprobe nearest buckets; the bucket join
below is exactly that shape with hash routing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 6) -> DataFrame:
    """Exact top-k neighbors per query (excluding self): (query_id,
    neighbor_id, cos). Deterministic tie-break on neighbor id.

    The cross join is the honest O(nq·nc) baseline; Spark executes it as
    BroadcastNestedLoopJoin when one side is small. ``round_to`` makes the
    score stable across engines (float→double accumulation order).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         round_to: int = 6) -> DataFrame:
    """Embedding near-duplicate pairs (id_a < id_b, cos ≥ threshold)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine(F.col("va"), F.col("vb")), round_to).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def _sign_bucket(vec, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of <v, p_i> packed into
    a long. ``planes`` are driver-side constants (deterministic seed)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec, arr) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, n_tables: int = 2, dim: int = 64,
             seed: int = 42, round_to: int = 6) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` sign-LSH tables, then exact cosine + rank. Scale path for
    the brute-force baseline (bucket equi-join instead of cross join)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cand = None
    for t in range(n_tables):
        planes = rng.standard_normal((n_planes, dim)).tolist()
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            _sign_bucket(F.col(vec_col), planes).alias("bucket"),
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
            _sign_bucket(F.col(vec_col), planes).alias("bucket"),
        )
        part = q.join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id")) \
                .select("query_id", "qv", "neighbor_id", "cv")
        cand = part if cand is None else cand.unionByName(part)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )
