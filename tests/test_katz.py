"""Katz centrality (graph/katz.py) vs networkx.katz_centrality —
the networkx implementation is pure-python power iteration (no
scipy), so it is the exact textbook oracle for the iteration the
engine runs. Alpha is chosen per-graph as 0.5/λ_max from a dense
numpy eigendecomposition of the same weighted adjacency, so the
contract α < 1/λ_max holds by construction."""

from __future__ import annotations

import math

import networkx as nx
import numpy as np
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.graph.katz import Katz, katz_centrality
from reddit_processing_spark.operators.extract import aggregate_edges, derive_edges


@pytest.fixture(scope="module")
def agg_edges(spark, tiny_dir):
    edges, _ = derive_edges(spark.read.parquet(tiny_dir))
    agg = aggregate_edges(edges).cache()
    agg.count()
    return agg


@pytest.fixture(scope="module")
def agg_pdf(agg_edges):
    return agg_edges.toPandas()


@pytest.fixture(scope="module")
def katz_alpha(agg_pdf):
    """0.5/λ_max of the weighted directed adjacency — safely inside
    the convergence region, computed from the same edge table."""
    vids = sorted(set(agg_pdf.src) | set(agg_pdf.dst))
    idx = {v: i for i, v in enumerate(vids)}
    a = np.zeros((len(vids), len(vids)))
    for r in agg_pdf.itertuples():
        a[idx[r.src], idx[r.dst]] += r.w
    lmax = max(abs(np.linalg.eigvals(a)))
    return 0.5 / float(lmax)


def _nx_digraph(agg_pdf):
    dg = nx.DiGraph()
    for r in agg_pdf.itertuples():
        dg.add_edge(r.src, r.dst, weight=float(r.w))
    return dg


def test_katz_matches_networkx(spark, agg_edges, agg_pdf, katz_alpha, tmp_path):
    got_df = katz_centrality(
        spark, agg_edges, alpha=katz_alpha, beta=1.0, tol=1e-12,
        max_iter=2000, ckpt_dir=str(tmp_path / "katz"), num_partitions=8,
    )
    got = {r.vid: r.katz for r in got_df.collect()}
    want = nx.katz_centrality(
        _nx_digraph(agg_pdf), alpha=katz_alpha, beta=1.0, tol=1e-12,
        max_iter=2000, weight="weight",
    )
    assert got.keys() == want.keys()
    assert max(abs(got[v] - want[v]) for v in want) < 1e-8
    # L2-normalized like networkx
    assert math.isclose(sum(v * v for v in got.values()), 1.0, abs_tol=1e-9)


def test_katz_resume_equivalence(spark, agg_edges, katz_alpha, tmp_path):
    """Stopping after 4 supersteps and resuming from the same ckpt_dir
    lands on the identical converged vector as an uninterrupted run."""
    full = katz_centrality(
        spark, agg_edges, alpha=katz_alpha, tol=1e-12, max_iter=500,
        ckpt_dir=str(tmp_path / "full"), num_partitions=8,
    ).toPandas().set_index("vid")["katz"]
    part_dir = str(tmp_path / "part")
    k = Katz(spark, agg_edges, num_partitions=8)
    try:
        with pytest.warns(UserWarning, match="not converged"):
            k.run(alpha=katz_alpha, tol=1e-12, max_iter=4, ckpt_dir=part_dir)
        resumed = k.run(
            alpha=katz_alpha, tol=1e-12, max_iter=500, ckpt_dir=part_dir
        ).toPandas().set_index("vid")["katz"]
    finally:
        k.unpersist()
    assert (full - resumed).abs().max() < 1e-10


def test_katz_rejects_checkpoint_from_other_params(spark, agg_edges, katz_alpha, tmp_path):
    """A ckpt_dir written under a different (α, β) must NOT resume —
    the fingerprint covers the problem instance, so the second run
    restarts and converges to ITS parameters' fixpoint (the
    personalized-PageRank checkpoint-identity lesson)."""
    d = str(tmp_path / "shared")
    k = Katz(spark, agg_edges, num_partitions=8)
    try:
        k.run(alpha=katz_alpha, beta=1.0, tol=1e-12, max_iter=500, ckpt_dir=d)
        other = k.run(
            alpha=katz_alpha / 2, beta=2.0, tol=1e-12, max_iter=500, ckpt_dir=d
        ).toPandas().set_index("vid")["katz"]
        fresh = k.run(
            alpha=katz_alpha / 2, beta=2.0, tol=1e-12, max_iter=500,
            ckpt_dir=str(tmp_path / "fresh"),
        ).toPandas().set_index("vid")["katz"]
    finally:
        k.unpersist()
    assert (other - fresh).abs().max() < 1e-12


def test_katz_divergence_raises(spark):
    """α ≥ 1/λ_max blows up geometrically; the growth guard turns
    that into a loud ValueError instead of max_iter dead supersteps.
    K4 has λ_max = 3; α = 0.9 diverges hard."""
    rows = [
        (a, b, 1.0) for a in range(1, 5) for b in range(1, 5) if a != b
    ]
    k4 = spark.createDataFrame(rows, "src long, dst long, w double")
    with pytest.raises(ValueError, match="alpha"):
        katz_centrality(spark, k4, alpha=0.9, tol=1e-12, max_iter=60,
                        num_partitions=4)


def test_katz_rejects_checkpoint_alpha_only_change(spark, agg_edges, katz_alpha, tmp_path):
    """Changing ONLY alpha (same beta) must reject the checkpoint —
    round-4 ADVICE: the unfolded 128-bit (α, β) pattern was masked to
    its low 63 bits, dropping alpha from the fingerprint entirely, so
    this exact case resumed silently."""
    d = str(tmp_path / "shared")
    k = Katz(spark, agg_edges, num_partitions=8)
    try:
        k.run(alpha=katz_alpha, beta=1.0, tol=1e-12, max_iter=500, ckpt_dir=d)
        other = k.run(
            alpha=katz_alpha / 2, beta=1.0, tol=1e-12, max_iter=500, ckpt_dir=d
        ).toPandas().set_index("vid")["katz"]
        fresh = k.run(
            alpha=katz_alpha / 2, beta=1.0, tol=1e-12, max_iter=500,
            ckpt_dir=str(tmp_path / "fresh"),
        ).toPandas().set_index("vid")["katz"]
    finally:
        k.unpersist()
    assert (other - fresh).abs().max() < 1e-12
