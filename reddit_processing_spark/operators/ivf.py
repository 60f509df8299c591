"""IVF (inverted-file) approximate nearest-neighbor index over an
embedding column — the coarse-quantizer scale path next to the
sign-hyperplane LSH in ``operators/similarity.py``.

Why a second ANN path (SURVEY.md §2.12): LSH buckets are data-
independent — good when the corpus distribution is unknown, but the
candidate set for a probe is whatever falls into the hashed buckets.
IVF *learns* the partitioning (spherical k-means), so on clustered
corpora (every real embedding corpus) a small ``nprobe / n_cells``
fraction of the data contains almost all true neighbors, and — the
100 TB property — the on-disk index is **physically partitioned by
cell**, so a probe is a *partition-pruned scan*: Spark reads only the
probed cells' files and never touches the rest of the corpus
(``search_ivf_index``; PartitionFilters asserted in the plan audit).

Scale shape:
- training state is O(n_cells × dim) — a few MB even at 65k cells —
  maintained on the driver like the PageRank convergence scalar; the
  per-iteration data pass is one ``mapInArrow`` kernel emitting
  per-batch partial sums (≤ n_cells rows per batch), i.e. a map-side
  combine with no shuffle at all.
- assignment/probing are pure per-row NumPy kernels (no shuffle);
  candidate generation is an id-only broadcast join on ``cell``.
  Unlike LSH (multi-table ⇒ duplicate candidates ⇒ ``distinct()``
  shuffle), every base row lives in exactly ONE cell, so candidates
  are disjoint by construction and need no dedup shuffle.
- determinism (SURVEY.md §4.3): no ``rand()`` — seeds are the
  ``n_cells`` rows with the smallest ``xxhash64(id)``; assignment
  tie-breaks on the smallest cell id. ``fit_centroids`` is
  deterministic for a fixed input partitioning (float partial-sum
  combine order); ``assign_cells``/``probe_cells``/search are pure
  functions of (centroids, row) — bit-identical across parallelism
  levels, proven in tests.

Null contract matches ``lsh_bucket_table``: null vectors, ragged
vectors, vectors with null ELEMENTS, and zero-norm vectors (cosine
undefined) are excluded — never indexed, never candidates.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_processing_spark.operators.similarity import (
    cosine,
    dense_valid_batch,
    valid_vec_rows,
)


def _dense_valid(batch, dim: int):
    """IVF-flavored dense extraction: the shared ANN batch gather
    (similarity.dense_valid_batch) PLUS zero-norm exclusion (cosine
    undefined for the zero vector — LSH keeps such rows, IVF must
    not). The plan-level null/ragged filter is valid_vec_rows, shared
    with LSH so the two paths' candidate semantics cannot diverge."""
    return dense_valid_batch(batch, dim, drop_zero_norm=True)


def _normalize(C: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(C, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return C / n


def fit_centroids(
    embeddings: DataFrame,
    n_cells: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 8,
    tol: float = 1e-4,
) -> np.ndarray:
    """Spherical k-means: ``n_cells`` L2-normalized centroids
    ``[n_cells, dim]`` (float64).

    Seeds = the ``n_cells`` valid rows with the smallest
    ``xxhash64(id)`` (deterministic, partitioning-independent). Each
    Lloyd iteration is ONE shuffle-free data pass: a ``mapInArrow``
    kernel assigns rows to their max-dot centroid and emits per-batch
    partial (cell, count, vector-sum) rows — ≤ ``n_cells`` rows per
    batch — which the driver combines (state is O(n_cells·dim), the
    same driver-scalar pattern as the PageRank L1 delta). Stops when
    the max centroid movement (L2) drops below ``tol``."""
    src = valid_vec_rows(embeddings, id_col, vec_col)
    # Seed query filters unusable rows (wrong dim, zero norm) IN the
    # query, so the limit counts only usable seeds — a fixed-headroom
    # limit raised a spurious "not enough valid vectors" whenever more
    # than ~a third of the smallest-hash rows were unusable even though
    # the corpus had plenty (round-3 ADVICE). For an all-usable corpus
    # the selected seeds are identical (the filter preserves hash
    # order).
    usable = src.where(
        (F.size("vec") == dim) & F.exists("vec", lambda x: x != F.lit(0.0))
    )
    seeds = (
        usable.select(F.xxhash64(F.col("id")).alias("h"), "id", "vec")
        .orderBy("h", "id")
        .limit(n_cells)
        .collect()
    )
    seed_vecs = [np.asarray(r["vec"], dtype=np.float64) for r in seeds]
    if len(seed_vecs) < n_cells:
        raise ValueError(
            f"not enough valid vectors ({len(seed_vecs)}) for n_cells={n_cells}"
        )
    C = _normalize(np.stack(seed_vecs))

    for _ in range(max_iter):
        Ct = C.T.copy()

        def partials(batches):
            import pyarrow as pa

            for b in batches:
                if b.num_rows == 0:
                    continue
                _, V = _dense_valid(b, dim)
                if V.shape[0] == 0:
                    continue
                a = np.argmax(V @ Ct, axis=1)  # first max = smallest cell id
                cells, inv = np.unique(a, return_inverse=True)
                cnt = np.bincount(inv)
                sums = np.zeros((len(cells), dim))
                np.add.at(sums, inv, V)
                yield pa.RecordBatch.from_pydict(
                    {
                        "cell": pa.array(cells.astype(np.int32), pa.int32()),
                        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                        "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    }
                )

        rows = src.mapInArrow(
            partials, "cell int, cnt long, vsum array<double>"
        ).collect()
        cnt = np.zeros(n_cells)
        acc = np.zeros((n_cells, dim))
        for r in rows:
            cnt[r["cell"]] += r["cnt"]
            acc[r["cell"]] += np.asarray(r["vsum"])
        newC = C.copy()  # empty cells keep their centroid
        nz = cnt > 0
        newC[nz] = _normalize(acc[nz] / cnt[nz, None])
        move = float(np.linalg.norm(newC - C, axis=1).max())
        C = newC
        if move < tol:
            break
    return C


def _cell_kernel(C: np.ndarray, dim: int, nprobe: int = 1):
    """mapInArrow kernel: (id, cell) rows — the ``nprobe`` highest-dot
    centroids per input row (1 for base assignment)."""
    Ct = C.T.copy()

    def kernel(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            ids, V = _dense_valid(b, dim)
            n = V.shape[0]
            if n == 0:
                continue
            dots = V @ Ct
            if nprobe == 1:
                cells = np.argmax(dots, axis=1)[:, None]
            else:
                p = min(nprobe, dots.shape[1])
                part = np.argpartition(-dots, p - 1, axis=1)[:, :p]
                # order probes by (-dot, cell) for a deterministic,
                # best-first probe list
                order = np.lexsort(
                    (part, -np.take_along_axis(dots, part, axis=1)), axis=1
                )
                cells = np.take_along_axis(part, order, axis=1)
            k = cells.shape[1]
            yield pa.RecordBatch.from_pydict(
                {
                    "id": pa.array(np.repeat(ids, k), pa.int64()),
                    "cell": pa.array(cells.ravel().astype(np.int32), pa.int32()),
                }
            )

    return kernel


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): each valid row's single nearest (max-dot) centroid.
    Pure per-row kernel — no shuffle, parallelism-invariant."""
    dim = centroids.shape[1]
    src = valid_vec_rows(df, id_col, vec_col)
    return src.mapInArrow(_cell_kernel(centroids, dim, 1), "id long, cell int")


def probe_cells(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): the ``nprobe`` nearest cells per query row."""
    dim = centroids.shape[1]
    src = valid_vec_rows(queries, id_col, vec_col)
    return src.mapInArrow(
        _cell_kernel(centroids, dim, nprobe), "id long, cell int"
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via IVF probing; same output schema as
    ``cosine_topk`` / ``cosine_topk_lsh``: (query_id, vec_id, sim, rk).

    Candidates = base rows whose (single) cell is among the query's
    ``nprobe`` probed cells — id-only through the broadcast cell join,
    disjoint by construction (no distinct), vectors re-attached once
    for the exact cosine re-rank."""
    if centroids is None:
        centroids = fit_centroids(
            embeddings, n_cells, dim, id_col=id_col, vec_col=vec_col
        )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))

    b_cells = assign_cells(embeddings, centroids, id_col, vec_col)
    q_probes = probe_cells(queries, centroids, nprobe, id_col, vec_col)

    cand_ids = (
        b_cells.join(
            F.broadcast(q_probes.withColumnRenamed("id", "query_id")), "cell"
        )
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("vec_id"))
    )
    scored = (
        cand_ids.join(base, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "vec_id", cosine(F.col("qvec"), F.col("vec")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "sim", "rk")
    )


# ---------------------------------------------------------------------------
# On-disk index: the 100 TB shape. Build once, probe with a
# partition-pruned scan.
# ---------------------------------------------------------------------------

def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 8,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the index at ``path``:

    - ``path/cells/cell=<c>/...`` — parquet, (id, vec), physically
      partitioned by cell so a probe scans only its cells' files;
    - ``path/centroids.json`` — the [n_cells, dim] codebook (driver
      metadata, a few MB at most — read back in one call).
    """
    if centroids is None:
        centroids = fit_centroids(
            embeddings, n_cells, dim, id_col=id_col, vec_col=vec_col,
            max_iter=max_iter,
        )
    base = valid_vec_rows(embeddings, id_col, vec_col)
    assigned = assign_cells(embeddings, centroids, id_col, vec_col)
    (
        base.join(assigned, "id")
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, "cells"))
    )
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(
            {"n_cells": int(centroids.shape[0]), "dim": int(centroids.shape[1]),
             "centroids": centroids.tolist()},
            f,
        )
    return centroids


def read_ivf_centroids(path: str) -> np.ndarray:
    with open(os.path.join(path, "centroids.json")) as f:
        meta = json.load(f)
    return np.asarray(meta["centroids"], dtype=np.float64)


def search_ivf_index_batch(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed top-k against a ``build_ivf_index`` output — the
    BATCH-JOIN variant of ``search_ivf_index`` (round-3 VERDICT #4).

    The serving path collects probe rows to the driver and broadcasts
    the query side — right for a dashboard, wrong for a 10⁹-row query
    batch. Here NOTHING query-sized touches the driver or a broadcast:

    - probe assignment is the same pure ``_cell_kernel`` mapInArrow
      pass, kept as a DataFrame;
    - candidate generation is an id-only SHUFFLE_HASH join on ``cell``
      (the scan reads only (id, cell) — column pruning keeps vector
      bytes out of the first shuffle, and candidates killed by the
      self-match filter never carry a vector);
    - vectors re-attach once per surviving candidate via SHUFFLE_HASH
      joins on ``vec_id`` / ``query_id``.

    Trade-off vs serving: no ``cell IN (...)`` partition pruning — a
    large batch probes essentially every cell, so the full-index scan
    is the right plan; per-query candidates and results are identical
    (parity asserted in tests, plan asserted broadcast-free)."""
    centroids = read_ivf_centroids(path)
    q_probes = (
        probe_cells(queries, centroids, nprobe, id_col, vec_col)
        .withColumnRenamed("id", "query_id")
    )
    cells = spark.read.parquet(os.path.join(path, "cells"))
    cand_ids = (
        cells.select("id", "cell")
        .join(q_probes.hint("SHUFFLE_HASH"), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("vec_id"))
    )
    base = cells.select(F.col("id").alias("vec_id"), "vec")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        cand_ids.join(base.hint("SHUFFLE_HASH"), "vec_id")
        .join(q.hint("SHUFFLE_HASH"), "query_id")
        .select(
            "query_id", "vec_id", cosine(F.col("qvec"), F.col("vec")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "sim", "rk")
    )


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k against a ``build_ivf_index`` output. The scan carries a
    ``cell IN (<union of probed cells>)`` predicate, so Spark's
    partition pruning skips every unprobed cell directory — at 100 TB
    the query touches ``~nprobe/n_cells`` of the corpus bytes (plan
    audited: PartitionFilters non-empty). Per-query restriction to its
    own probe list happens in the subsequent broadcast join."""
    centroids = read_ivf_centroids(path)
    # probe rows are O(n_queries * nprobe) — collect once (driver
    # metadata, like the centroids), reuse for both the partition
    # filter and the per-query restriction join.
    probe_rows = probe_cells(queries, centroids, nprobe, id_col, vec_col).collect()
    probed = sorted({r["cell"] for r in probe_rows})
    q_probes = spark.createDataFrame(
        [(r["id"], r["cell"]) for r in probe_rows], "query_id long, cell int"
    )

    cells = spark.read.parquet(os.path.join(path, "cells")).filter(
        F.col("cell").isin(probed)
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    cand = (
        cells.join(F.broadcast(q_probes), "cell")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("vec_id"), "vec")
    )
    scored = cand.join(F.broadcast(q), "query_id").select(
        "query_id", "vec_id", cosine(F.col("qvec"), F.col("vec")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "sim", "rk")
    )
