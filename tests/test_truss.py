"""k-truss decomposition (graph/truss.py) vs networkx.k_truss —
edge-for-edge parity, cascade peeling, resume equivalence, and the
(graph, k) checkpoint-identity guard.

The transcript fixture graph is triangle-free (user↔thread edges are
bipartite; role→role edges don't close), so truss tests use dense
deterministic synthetic graphs — the same reason the driver's
triangle entries run on part co-occurrence graphs."""

from __future__ import annotations

import networkx as nx
import pytest

from reddit_processing_spark.graph.truss import k_truss


@pytest.fixture(scope="module")
def dense_edges(spark):
    """Deterministic pseudo-random graph on 40 vertices (~40% pair
    density) — rich, multi-level truss structure, no rand()."""
    rows = [
        (i, j, 1.0)
        for i in range(40)
        for j in range(i + 1, 40)
        if (i * 31 + j * 17 + i * j) % 5 < 2
    ]
    e = spark.createDataFrame(rows, "src long, dst long, w double").cache()
    e.count()
    return e


@pytest.fixture(scope="module")
def dense_nx(dense_edges):
    g = nx.Graph()
    for r in dense_edges.toPandas().itertuples():
        g.add_edge(r.src, r.dst)
    return g


@pytest.fixture()
def cascade_edges(spark):
    """K5 on {1..5} plus a disjoint 5-vertex triangle strip on
    {10..14}: at k=4 the strip peels in TWO cascading rounds (outer
    rungs first, the surviving middle triangle second) while K5 is
    the stable fixpoint — guarantees a run capped at max_rounds=1
    stops strictly before convergence."""
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    strip = [(10, 11), (11, 12), (12, 13), (13, 14), (10, 12), (11, 13), (12, 14)]
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in k5 + strip], "src long, dst long, w double"
    )


def _edge_set(df):
    return {(r.a, r.b) for r in df.collect()}


def _nx_edge_set(g):
    return {(min(u, v), max(u, v)) for u, v in g.edges()}


@pytest.mark.parametrize("k", [3, 4, 5, 6])
def test_k_truss_matches_networkx(spark, dense_edges, dense_nx, tmp_path, k):
    got = _edge_set(
        k_truss(spark, dense_edges, k=k, ckpt_dir=str(tmp_path / f"t{k}"),
                num_partitions=8)
    )
    want = _nx_edge_set(nx.k_truss(dense_nx, k))
    assert got == want
    if k <= 5:
        assert len(want) > 0  # density sanity: the graph has deep trusses


def test_k_truss_hand_checked(spark):
    """K4 with a pendant triangle hanging off vertex 1: the 4-truss
    keeps exactly the K4 edges; the pendant triangle (support-1
    edges) peels away. At k=3 everything survives."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pendant = [(1, 10), (1, 11), (10, 11)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in k4 + pendant], "src long, dst long, w double"
    )
    got = _edge_set(k_truss(spark, e, k=4, num_partitions=4))
    assert got == set(k4)
    got3 = _edge_set(k_truss(spark, e, k=3, num_partitions=4))
    assert got3 == set(k4) | set(pendant)


def test_k_truss_cascade_and_resume(spark, cascade_edges, tmp_path):
    """The strip needs cascading rounds: a run capped at one round
    warns and is NOT yet the fixpoint; resuming from its ckpt_dir
    finishes the peel and lands on the identical K5 fixpoint as an
    uninterrupted run (and matches networkx)."""
    full = _edge_set(
        k_truss(spark, cascade_edges, k=4, ckpt_dir=str(tmp_path / "full"),
                num_partitions=4)
    )
    g = nx.Graph()
    for r in cascade_edges.toPandas().itertuples():
        g.add_edge(r.src, r.dst)
    assert full == _nx_edge_set(nx.k_truss(g, 4))
    assert full == {(a, b) for a in range(1, 6) for b in range(a + 1, 6)}

    part = str(tmp_path / "part")
    with pytest.warns(UserWarning, match="round budget"):
        capped = _edge_set(
            k_truss(spark, cascade_edges, k=4, ckpt_dir=part, max_rounds=1,
                    num_partitions=4)
        )
    assert capped != full  # strictly before convergence
    resumed = _edge_set(
        k_truss(spark, cascade_edges, k=4, ckpt_dir=part, num_partitions=4)
    )
    assert resumed == full


def test_k_truss_rejects_checkpoint_from_other_k(spark, dense_edges, tmp_path):
    """A ckpt_dir written while peeling toward a DIFFERENT k must not
    resume — the fingerprint mixes k with the edge set, so the second
    run restarts and computes ITS truss, not a continuation of the
    other one."""
    d = str(tmp_path / "shared")
    k_truss(spark, dense_edges, k=3, ckpt_dir=d, num_partitions=8)
    with pytest.warns(UserWarning, match="DIFFERENT input graph"):
        got = _edge_set(k_truss(spark, dense_edges, k=6, ckpt_dir=d,
                                num_partitions=8))
    fresh = _edge_set(
        k_truss(spark, dense_edges, k=6, ckpt_dir=str(tmp_path / "fresh"),
                num_partitions=8)
    )
    assert got == fresh


def test_k_truss_rejects_bad_k(spark, dense_edges):
    with pytest.raises(ValueError, match="k must be"):
        k_truss(spark, dense_edges, k=1)


def test_k_truss_resume_at_exhausted_round_budget(spark, cascade_edges, tmp_path):
    """Resuming with start_round >= max_rounds must return the
    CHECKPOINTED edge set with the round-budget warning — not an empty
    frame (round-4 ADVICE: the loop never runs on this path, so the
    old n_edges=None gate fell through to the empty branch)."""
    part = str(tmp_path / "part")
    with pytest.warns(UserWarning, match="round budget"):
        capped = _edge_set(
            k_truss(spark, cascade_edges, k=4, ckpt_dir=part, max_rounds=1,
                    num_partitions=4)
        )
    assert capped  # round 1 kept a non-empty edge set
    with pytest.warns(UserWarning, match="round budget"):
        again = _edge_set(
            k_truss(spark, cascade_edges, k=4, ckpt_dir=part, max_rounds=1,
                    num_partitions=4)
        )
    assert again == capped
