"""Multi-source BFS distances: exact (integer hop counts) vs
networkx single-source BFS folded over the source set."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.graph.bfs import bfs_distances
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


def _sources(agg_pdf) -> list[int]:
    vids = sorted(set(agg_pdf["src"].tolist()) | set(agg_pdf["dst"].tolist()))
    return [vids[0], vids[len(vids) // 2], vids[-1]]


def _nx_multi_bfs(g, sources) -> dict[int, int]:
    out: dict[int, int] = {}
    for s in sources:
        if s not in g:
            continue
        for v, d in nx.single_source_shortest_path_length(g, s).items():
            if v not in out or d < out[v]:
                out[v] = d
    return out


def test_bfs_undirected_exact(spark, agg_edges, agg_pdf, tmp_path):
    srcs = _sources(agg_pdf)
    g = nx.Graph()
    for r in agg_pdf.itertuples():
        if r.src != r.dst:
            g.add_edge(r.src, r.dst)
    want = _nx_multi_bfs(g, srcs)

    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    got = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "bfs"),
        ).collect()
    }
    assert got == want


def test_bfs_directed_exact(spark, agg_edges, agg_pdf, tmp_path):
    srcs = _sources(agg_pdf)[:1]
    g = nx.DiGraph()
    for r in agg_pdf.itertuples():
        if r.src != r.dst:
            g.add_edge(r.src, r.dst)
    want = _nx_multi_bfs(g, srcs)
    # directed view keeps self-loop-free edges as-is; isolated check:
    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    got = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges.where(F.col("src") != F.col("dst")),
            src_df, num_partitions=8, directed=True,
            ckpt_dir=str(tmp_path / "bfs_dir"),
        ).collect()
    }
    assert got == want


def test_bfs_resume_equivalence(spark, agg_edges, agg_pdf, tmp_path):
    srcs = _sources(agg_pdf)[:1]
    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    full = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "full"),
        ).collect()
    }
    part_dir = str(tmp_path / "part")
    bfs_distances(
        spark, agg_edges, src_df, num_partitions=8,
        ckpt_dir=part_dir, max_iter=2,
    )  # "killed" after 2 supersteps
    resumed = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_df, num_partitions=8, ckpt_dir=part_dir
        ).collect()
    }
    assert resumed == full


def test_bfs_changed_sources_reject_stale_checkpoint(spark, agg_edges, agg_pdf, tmp_path):
    """The checkpoint identity covers the SOURCE set, not just the edge
    set: resuming a ckpt_dir written for a different source set must
    restart from superstep 0 and return the NEW sources' distances
    (round-3 ADVICE — edge-only fingerprint silently resumed the old
    run's state)."""
    srcs = _sources(agg_pdf)
    src_a = spark.createDataFrame([(srcs[0],)], "vid long")
    src_b = spark.createDataFrame([(srcs[-1],)], "vid long")
    shared = str(tmp_path / "shared")

    bfs_distances(spark, agg_edges, src_a, num_partitions=8, ckpt_dir=shared)
    with pytest.warns(UserWarning, match="DIFFERENT input graph"):
        got_b = {
            r.vid: r.dist
            for r in bfs_distances(
                spark, agg_edges, src_b, num_partitions=8, ckpt_dir=shared
            ).collect()
        }
    fresh_b = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_b, num_partitions=8,
            ckpt_dir=str(tmp_path / "fresh"),
        ).collect()
    }
    assert got_b == fresh_b


def _nx_multi_dijkstra(g, sources) -> dict[int, float]:
    out: dict[int, float] = {}
    for s in sources:
        if s not in g:
            continue
        for v, d in nx.single_source_dijkstra_path_length(g, s, weight="w").items():
            if v not in out or d < out[v]:
                out[v] = d
    return out


def test_sssp_weighted_exact(spark, agg_edges, agg_pdf, tmp_path):
    """Weighted shortest paths vs networkx Dijkstra folded over the
    source set — exact (integer-valued double weights ⇒ path sums are
    exactly representable and min is comparison-only)."""
    from reddit_processing_spark.graph.bfs import shortest_paths

    srcs = _sources(agg_pdf)
    g = nx.Graph()
    for r in agg_pdf.itertuples():
        if r.src != r.dst:
            # undirected with per-direction min: nx.Graph keeps one
            # edge; replicate the operator's min rule on re-add
            w = min(r.w, g[r.src][r.dst]["w"]) if g.has_edge(r.src, r.dst) else r.w
            g.add_edge(r.src, r.dst, w=w)
    want = _nx_multi_dijkstra(g, srcs)

    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    got = {
        r.vid: r.dist
        for r in shortest_paths(
            spark, agg_edges, src_df, ckpt_dir=str(tmp_path / "sssp")
        ).collect()
    }
    assert got == want


def test_sssp_unit_weights_equal_bfs(spark, agg_edges, agg_pdf, tmp_path):
    """With all weights forced to 1.0, weighted distances equal hop
    distances — the BFS identity."""
    from reddit_processing_spark.graph.bfs import shortest_paths

    srcs = _sources(agg_pdf)[:1]
    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    unit = agg_edges.withColumn("w", F.lit(1.0))
    got = {
        r.vid: int(r.dist)
        for r in shortest_paths(
            spark, unit, src_df, ckpt_dir=str(tmp_path / "unit")
        ).collect()
    }
    hops = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_df, ckpt_dir=str(tmp_path / "hops"),
        ).collect()
    }
    assert got == hops


def test_sssp_rejects_negative_weights(spark, tmp_path):
    from reddit_processing_spark.graph.bfs import shortest_paths

    df = spark.createDataFrame([(1, 2, -0.5)], "src long, dst long, w double")
    src_df = spark.createDataFrame([(1,)], "vid long")
    with pytest.raises(ValueError, match="non-negative"):
        shortest_paths(spark, df, src_df, ckpt_dir=str(tmp_path / "neg"))
