"""Brandes betweenness (graph/betweenness.py): full-sample exactness
vs networkx and sampled-pivot parity vs a pure-python Brandes run on
the identical pivot set."""

from __future__ import annotations

import math
from collections import defaultdict, deque

import networkx as nx
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.graph.betweenness import betweenness_estimate
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


def _brandes_raw(g: nx.Graph, pivots) -> dict:
    """Σ over pivots s of the Brandes dependency δ_s(v) — the textbook
    algorithm verbatim (BFS + stack-ordered accumulation)."""
    bc = {v: 0.0 for v in g}
    for s in pivots:
        stack, preds = [], defaultdict(list)
        sigma = {v: 0.0 for v in g}
        sigma[s] = 1.0
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in g[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in g}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_full_sample_matches_networkx(spark, agg_edges, nx_graph, tmp_path):
    """Every vertex a pivot ⇒ bc_est (= bc_raw/2 at n/k = 1) equals
    networkx.betweenness_centrality(normalized=False) exactly."""
    n = nx_graph.number_of_nodes()
    got = {
        r.vid: r.bc_est
        for r in betweenness_estimate(
            spark, agg_edges, k=n, num_partitions=8,
            ckpt_dir=str(tmp_path / "full"),
        ).collect()
    }
    want = nx.betweenness_centrality(nx_graph, normalized=False)
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=1e-9, abs_tol=1e-6), v


def test_betweenness_sampled_matches_python_pivots(spark, agg_edges, nx_graph, tmp_path):
    """k=5 hash-chosen pivots: bc_raw equals the python Brandes sum
    over the same pivots; bc_est carries the (n/k)/2 scale."""
    k = 5
    n = nx_graph.number_of_nodes()
    noself = agg_edges.filter(F.col("src") != F.col("dst"))
    pivots = [
        r.vid
        for r in noself.select(F.col("src").alias("vid"))
        .unionByName(noself.select(F.col("dst").alias("vid")))
        .distinct()
        .orderBy(F.xxhash64("vid").asc(), F.col("vid").asc())
        .limit(k)
        .collect()
    ]
    want = _brandes_raw(nx_graph, pivots)
    got = {
        r.vid: (r.bc_raw, r.bc_est)
        for r in betweenness_estimate(
            spark, agg_edges, k=k, num_partitions=8,
            ckpt_dir=str(tmp_path / "sub"),
        ).collect()
    }
    assert set(got) == set(want)
    for v in want:
        raw, est = got[v]
        assert math.isclose(raw, want[v], rel_tol=1e-9, abs_tol=1e-9), v
        assert math.isclose(est, want[v] * n / k / 2.0, rel_tol=1e-9, abs_tol=1e-9), v


def test_betweenness_explicit_sources_path_graph(spark, tmp_path):
    """Hand-checkable path 1-2-3-4-5, all sources: interior vertices
    carry bc 2·(left·right) raw; bc_est halves it to the unordered
    convention (3 ↦ 4.0 = nx's value on P5)."""
    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    ).withColumn("w", F.lit(1.0))
    allv = spark.createDataFrame([(i,) for i in range(1, 6)], "vid long")
    got = {
        r.vid: r.bc_est
        for r in betweenness_estimate(
            spark, path, sources=allv, num_partitions=4,
            ckpt_dir=str(tmp_path / "p5"),
        ).collect()
    }
    assert got == {1: 0.0, 2: 3.0, 3: 4.0, 4: 3.0, 5: 0.0}
