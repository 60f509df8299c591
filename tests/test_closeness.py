"""Sampled closeness / harmonic centrality (graph/closeness.py):
per-source BFS exactness vs networkx, harmonic estimator ≡
networkx.harmonic_centrality at k = n, and estimator-formula parity
at k < n against a pure-python computation over the SAME
deterministic seed set."""

from __future__ import annotations

import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.graph.closeness import (
    bfs_per_source,
    closeness_estimate,
)
from reddit_processing_spark.operators.extract import aggregate_edges, derive_edges


@pytest.fixture(scope="module")
def agg_edges(spark, tiny_dir):
    edges, _ = derive_edges(spark.read.parquet(tiny_dir))
    agg = aggregate_edges(edges).cache()
    agg.count()
    return agg


@pytest.fixture(scope="module")
def nx_graph(agg_edges):
    g = nx.Graph()
    for r in agg_edges.toPandas().itertuples():
        if r.src != r.dst:
            g.add_edge(r.src, r.dst)
    return g


def test_bfs_per_source_exact(spark, agg_edges, nx_graph, tmp_path):
    vids = sorted(nx_graph.nodes())
    srcs = [vids[0], vids[len(vids) // 3], vids[-1]]
    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    got = {
        (r.vid, r.s): r.dist
        for r in bfs_per_source(
            spark, agg_edges, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "ps"),
        ).collect()
    }
    want = {
        (v, s): d
        for s in srcs
        for v, d in nx.single_source_shortest_path_length(nx_graph, s).items()
    }
    assert got == want


def test_harmonic_exact_at_full_sample(spark, agg_edges, nx_graph, tmp_path):
    """k = |V| makes the estimator exact: harmonic_est ==
    networkx.harmonic_centrality (disconnection handled natively)."""
    n = nx_graph.number_of_nodes()
    got = {
        r.vid: r.harmonic_est
        for r in closeness_estimate(
            spark, agg_edges, k=n, num_partitions=8,
            ckpt_dir=str(tmp_path / "full"),
        ).collect()
    }
    want = nx.harmonic_centrality(nx_graph)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=0, abs_tol=1e-9), v


def test_estimator_matches_python_formula(spark, agg_edges, nx_graph, tmp_path):
    """k < n: the Spark estimates equal the Eppstein–Wang formulas
    computed in python over the identical hash-chosen seed set."""
    k = 4
    n = nx_graph.number_of_nodes()
    # deterministic seeds = the same min-k-by-xxhash64 order the
    # operator uses — read them back from Spark so the python side
    # replays the identical sample
    noself = agg_edges.filter(F.col("src") != F.col("dst"))
    seeds = [
        r.vid
        for r in (
            noself.select(F.col("src").alias("vid"))
            .unionByName(noself.select(F.col("dst").alias("vid")))
            .distinct()
            .orderBy(F.xxhash64("vid").asc(), F.col("vid").asc())
            .limit(k)
            .collect()
        )
    ]
    dist = {
        s: nx.single_source_shortest_path_length(nx_graph, s) for s in seeds
    }
    got = {
        r.vid: (r.n_seen, r.closeness_est, r.harmonic_est)
        for r in closeness_estimate(
            spark, agg_edges, k=k, num_partitions=8,
            ckpt_dir=str(tmp_path / "sub"),
        ).collect()
    }
    reached = {v for s in seeds for v in dist[s]}
    assert set(got) == reached
    for v in reached:
        ds = [dist[s][v] for s in seeds if v in dist[s]]
        tot, hsum = sum(ds), sum(1.0 / d for d in ds if d > 0)
        want_c = (k * (n - 1)) / (n * tot) if tot > 0 else None
        want_h = (n / k) * hsum
        n_seen, c, h = got[v]
        assert n_seen == len(ds)
        if want_c is None:
            assert c is None
        else:
            assert math.isclose(c, want_c, rel_tol=0, abs_tol=1e-9), v
        assert math.isclose(h, want_h, rel_tol=0, abs_tol=1e-9), v


def test_eccentricity_sample_exact(spark, agg_edges, nx_graph, tmp_path):
    """Sampled eccentricities are exact per seed, and their max lower-
    bounds the component diameter (equals it at full sample on the
    largest component)."""
    from reddit_processing_spark.graph.closeness import eccentricity_sample

    n = nx_graph.number_of_nodes()
    got = {
        r.s: (r.ecc, r.n_reached)
        for r in eccentricity_sample(
            spark, agg_edges, k=n, num_partitions=8,
            ckpt_dir=str(tmp_path / "ecc"),
        ).collect()
    }
    assert set(got) == set(nx_graph.nodes())
    for s in got:
        dists = nx.single_source_shortest_path_length(nx_graph, s)
        assert got[s] == (max(dists.values()), len(dists))


def test_bfs_per_source_fused_equals_unfused(spark, agg_edges, nx_graph, tmp_path):
    """ckpt_every > 1 composes (vid, source)-keyed BFS rounds into one
    checkpointed job: results identical to cadence 1 (and to networkx),
    step indices count ROUNDS, fewer checkpoints on disk, and resume
    across a cadence change converges to the same fixpoint."""
    import glob
    import json
    import os

    vids = sorted(nx_graph.nodes())
    srcs = [vids[0], vids[len(vids) // 3], vids[-1]]
    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    base = {
        (r.vid, r.s): r.dist
        for r in bfs_per_source(
            spark, agg_edges, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "c1"),
        ).collect()
    }
    fused = {
        (r.vid, r.s): r.dist
        for r in bfs_per_source(
            spark, agg_edges, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "c3"), ckpt_every=3,
        ).collect()
    }
    want = {
        (v, s): d
        for s in srcs
        for v, d in nx.single_source_shortest_path_length(nx_graph, s).items()
    }
    assert fused == base == want

    m1 = glob.glob(os.path.join(str(tmp_path / "c1"), "bfs_per_source", "manifest_*.json"))
    m3 = sorted(glob.glob(os.path.join(str(tmp_path / "c3"), "bfs_per_source", "manifest_*.json")))
    assert len(m3) < len(m1)
    with open(m3[0]) as fh:
        first = json.load(fh)
    assert first["superstep"] == first["metrics"]["rounds_in_block"] == 3

    # interrupted fused run resumes under a different cadence
    ck = str(tmp_path / "fresume")
    bfs_per_source(spark, agg_edges, src_df, num_partitions=8, max_iter=4,
                   ckpt_dir=ck, ckpt_every=2)
    resumed = {
        (r.vid, r.s): r.dist
        for r in bfs_per_source(
            spark, agg_edges, src_df, num_partitions=8, ckpt_dir=ck,
            ckpt_every=5,
        ).collect()
    }
    assert resumed == want
