"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      : exact brute-force top-k, built-in higher-order
                         functions only (zip_with dot product +
                         aggregate norms) — the correctness baseline.
- ``cosine_topk_lsh``  : the scale path — deterministic random-
                         hyperplane LSH (sign-hash buckets), candidates
                         only within matching buckets (multi-probe via
                         several independent tables), exact re-rank.
                         Sub-linear candidate sets at 100 TB; recall
                         measured against the brute-force baseline in
                         tests.

No rand(): hyperplanes derive from splitmix64 of (table, plane, dim) —
reproducible across runs and parallelism (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return (_dot(a, b) / (_norm(a) * _norm(b))).cast("double")


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (query_id, vec_id, sim, rk).

    ``queries`` is broadcast (top-k search is many-vs-few; for
    many-vs-many use the LSH variant). Deterministic tie-break on
    neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    scored = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", cosine(F.col("qvec"), F.col("vec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "sim", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes from splitmix64(table, plane, dim)."""
    idx = (
        np.uint64(table) * np.uint64(1_000_003)
        + np.arange(n_planes, dtype=np.uint64)[:, None] * np.uint64(10_007)
        + np.arange(dim, dtype=np.uint64)[None, :]
    )
    z = (idx + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return np.where((z & np.uint64(1)).astype(bool), 1.0, -1.0)


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-hash bucket id for one LSH table (planes: [P, dim])."""
    bits = [
        (_dot(vec, F.array(*[F.lit(float(v)) for v in row])) >= 0).cast("int")
        for row in planes
    ]
    out = F.lit(0)
    for b in bits:
        out = out * 2 + b
    return out


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ANY of
    ``n_tables`` sign-hash tables; exact cosine re-rank on candidates.
    Same output schema as ``cosine_topk``."""
    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))

    b_buckets = base.select(
        "vec_id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col("vec"), _hyperplanes(dim, n_planes, t)).alias("bkt"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "vec", "tb.tbl", "tb.bkt")
    q_buckets = q.select(
        "query_id",
        "qvec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col("qvec"), _hyperplanes(dim, n_planes, t)).alias("bkt"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("query_id", "qvec", "tb.tbl", "tb.bkt")

    cand = (
        b_buckets.join(F.broadcast(q_buckets), ["tbl", "bkt"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qvec", "vec_id", "vec")
        .distinct()
    )
    scored = cand.select(
        "query_id", "vec_id", cosine(F.col("qvec"), F.col("vec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "sim", "rk")
    )


def embedding_near_dupes(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b,
    sim >= threshold) via LSH blocking + exact verify — the embedding
    leg of the dedup suite."""
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    buckets = base.select(
        "id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col("vec"), _hyperplanes(dim, n_planes, t)).alias("bkt"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "vec", "tb.tbl", "tb.bkt")
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), ["tbl", "bkt"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("l.vec").alias("vec_a"),
            F.col("r.id").alias("id_b"),
            F.col("r.vec").alias("vec_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
