"""IVF ANN tests: recall vs the exact brute-force baseline on a
clustered corpus, single-cell assignment invariants, parallelism
invariance of the pure kernels, null/zero-vector exclusion, and the
on-disk index's partition-pruned probe scan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.operators.ivf import (
    assign_cells,
    build_ivf_index,
    cosine_topk_ivf,
    fit_centroids,
    probe_cells,
    read_ivf_centroids,
    search_ivf_index,
)
from reddit_processing_spark.operators.similarity import cosine_topk

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def clustered(spark):
    """600 vectors in 12 well-separated direction clusters (spherical
    k-means' home turf) — deterministic, seed=42."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(12, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(600):
        c = i % 12
        v = centers[c] + 0.15 * rng.normal(size=DIM)
        rows.append((i, [float(x) for x in v]))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    return spark.createDataFrame(pdf).cache()


def test_fit_centroids_shape_and_norm(spark, clustered):
    C = fit_centroids(clustered, n_cells=12, dim=DIM, max_iter=10)
    assert C.shape == (12, DIM)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-9)


def test_assign_exactly_one_cell_per_row(spark, clustered):
    C = fit_centroids(clustered, n_cells=12, dim=DIM)
    a = assign_cells(clustered, C).toPandas()
    assert len(a) == 600
    assert a["id"].is_unique
    assert a["cell"].between(0, 11).all()


def test_assignment_parallelism_invariant(spark, clustered):
    """assign/probe are pure per-row functions of (centroids, row):
    bit-identical across partitionings (SURVEY §4.3 determinism)."""
    C = fit_centroids(clustered, n_cells=12, dim=DIM)
    a1 = assign_cells(clustered, C).toPandas().set_index("id")["cell"]
    a2 = (
        assign_cells(clustered.repartition(13), C)
        .toPandas()
        .set_index("id")["cell"]
    )
    assert dict(a1) == dict(a2)
    p1 = probe_cells(clustered, C, nprobe=3).toPandas()
    p2 = probe_cells(clustered.repartition(7), C, nprobe=3).toPandas()
    k1 = p1.sort_values(["id", "cell"]).reset_index(drop=True)
    k2 = p2.sort_values(["id", "cell"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(k1, k2)


def test_ivf_recall_on_clustered(spark, clustered):
    """On a clustered corpus, probing 3/12 learned cells must recover
    nearly all true neighbors (neighbors live in the query's own
    direction cluster); a random 25% candidate subset would give
    recall ~0.25."""
    queries = clustered.filter(F.col("vec_id") < 24)
    exact = cosine_topk(clustered, queries, k=10).toPandas()
    approx = cosine_topk_ivf(
        clustered, queries, k=10, n_cells=12, nprobe=3, dim=DIM
    ).toPandas()
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_on_driver_embeddings_full_probe_equals_exact(spark):
    """nprobe == n_cells ⇒ every cell probed ⇒ IVF degenerates to the
    exact brute force (same candidates, same re-rank) — an identity
    that holds on ANY corpus, including the unclustered driver table."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk(emb, queries, k=5).toPandas()
    full = cosine_topk_ivf(
        emb, queries, k=5, n_cells=8, nprobe=8, dim=DIM
    ).toPandas()
    e = exact.sort_values(["query_id", "rk"]).reset_index(drop=True)
    g = full.sort_values(["query_id", "rk"]).reset_index(drop=True)
    assert list(e["vec_id"]) == list(g["vec_id"])
    assert np.allclose(e["sim"], g["sim"], atol=1e-12)


def test_ivf_excludes_invalid_vectors(spark, clustered):
    """Null vector, null element, ragged, and all-zero rows are never
    indexed (cosine undefined / undefined shape) — same contract as
    lsh_bucket_table."""
    bad_elem = [0.5] * DIM
    bad_elem[3] = None
    extra = spark.createDataFrame(
        [
            (900001, None),
            (900002, bad_elem),
            (900003, [1.0, 2.0]),
            (900004, [0.0] * DIM),
        ],
        "vec_id long, embedding array<double>",
    )
    df = clustered.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(extra)
    C = fit_centroids(df, n_cells=12, dim=DIM)
    a = assign_cells(df, C).toPandas()
    assert set(a["id"]) & {900001, 900002, 900003, 900004} == set()
    assert len(a) == 600


def test_ivf_index_build_search_and_pruning(spark, clustered, tmp_path):
    """On-disk index: search results match the in-memory IVF with the
    same centroids, and the probe scan's plan carries a partition
    filter on cell (only probed cell directories are read)."""
    path = str(tmp_path / "ivf_idx")
    C = build_ivf_index(clustered, path, n_cells=12, dim=DIM)
    C2 = read_ivf_centroids(path)
    assert np.allclose(C, C2)

    # 3 queries from 3 clusters, nprobe=2 ⇒ at most 6 of 12 cells probed
    queries = clustered.filter(F.col("vec_id") < 3)
    got = search_ivf_index(spark, path, queries, k=10, nprobe=2).toPandas()
    mem = cosine_topk_ivf(
        clustered, queries, k=10, n_cells=12, nprobe=2, dim=DIM, centroids=C
    ).toPandas()
    g = got.sort_values(["query_id", "rk"]).reset_index(drop=True)
    m = mem.sort_values(["query_id", "rk"]).reset_index(drop=True)
    assert list(g["vec_id"]) == list(m["vec_id"])
    assert np.allclose(g["sim"], m["sim"], atol=1e-12)

    # plan: the cells scan must be partition-pruned on cell
    probed = sorted({r["cell"] for r in probe_cells(queries, C, 2).collect()})
    scan = spark.read.parquet(f"{path}/cells").filter(F.col("cell").isin(probed))
    plan = scan._sc._jvm.PythonSQLUtils.explainString(
        scan._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cell" in plan
    # and pruning actually reduces the input: the files the pruned scan
    # TOUCHES at runtime (input_file_name) are exactly the probed cell
    # directories, a strict subset of the index
    touched = {
        r[0]
        for r in scan.select(F.input_file_name().alias("f")).distinct().collect()
    }
    all_files = set(spark.read.parquet(f"{path}/cells").inputFiles())
    assert 0 < len(touched) < len(all_files)
    assert all(any(f"cell={c}/" in f for c in probed) for f in touched)


def test_fit_centroids_tolerates_mostly_invalid_corpus(spark, clustered):
    """Seed selection filters zero-norm / wrong-dim rows IN the query,
    so a corpus that is 80% unusable still trains: the old fixed
    1.5×n_cells headroom raised a spurious 'not enough valid vectors'
    whenever too many of the smallest-hash rows were unusable
    (round-3 ADVICE)."""
    junk = []
    for i in range(600, 3000):
        if i % 2 == 0:
            junk.append((i, [0.0] * DIM))       # zero-norm
        else:
            junk.append((i, [1.0] * (DIM // 2)))  # wrong dim
    junk_df = spark.createDataFrame(
        pd.DataFrame(junk, columns=["vec_id", "embedding"])
    )
    corpus = clustered.unionByName(junk_df)
    C = fit_centroids(corpus, n_cells=12, dim=DIM, max_iter=4)
    assert C.shape == (12, DIM)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)


def test_ivf_batch_search_parity_and_no_broadcast(spark, clustered, tmp_path):
    """The distributed batch path returns exactly the serving path's
    results (same candidates ⇒ same top-k, deterministic vec_id
    tie-break), and its physical plan contains NO broadcast exchange —
    nothing query-sized may touch the driver or a broadcast (round-3
    VERDICT #4: the serving path's collect+broadcast is wrong for a
    10⁹-row query batch)."""
    from reddit_processing_spark.operators.ivf import search_ivf_index_batch

    path = str(tmp_path / "ivf_idx_b")
    build_ivf_index(clustered, path, n_cells=12, dim=DIM)

    queries = clustered.filter(F.col("vec_id") % 50 == 0)  # 12 queries
    serve = search_ivf_index(spark, path, queries, k=10, nprobe=3).toPandas()
    batch = search_ivf_index_batch(spark, path, queries, k=10, nprobe=3)
    plan = batch._sc._jvm.PythonSQLUtils.explainString(
        batch._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastExchange" not in plan
    got = batch.toPandas()
    s = serve.sort_values(["query_id", "rk"]).reset_index(drop=True)
    b = got.sort_values(["query_id", "rk"]).reset_index(drop=True)
    assert list(b["query_id"]) == list(s["query_id"])
    assert list(b["vec_id"]) == list(s["vec_id"])
    assert np.allclose(b["sim"], s["sim"], atol=1e-12)
