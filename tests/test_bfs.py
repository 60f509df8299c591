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


def test_bfs_fused_equals_unfused(spark, agg_edges, agg_pdf, tmp_path):
    """ckpt_every > 1 composes BFS rounds into one job — distances must
    be identical to cadence 1 (and to networkx), step indices must
    count ROUNDS (cadence-comparable manifests), fusion must reduce the
    checkpoint count, and round budgets must be exact when max_iter is
    not a multiple of the cadence."""
    import glob
    import json
    import os

    srcs = _sources(agg_pdf)
    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    base = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "c1"),
        ).collect()
    }
    fused = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "c3"), ckpt_every=3,
        ).collect()
    }
    g = nx.Graph()
    for r in agg_pdf.itertuples():
        if r.src != r.dst:
            g.add_edge(r.src, r.dst)
    assert fused == base == _nx_multi_bfs(g, srcs)

    m1 = sorted(glob.glob(os.path.join(str(tmp_path / "c1"), "bfs", "manifest_*.json")))
    m3 = sorted(glob.glob(os.path.join(str(tmp_path / "c3"), "bfs", "manifest_*.json")))
    assert len(m3) < len(m1)
    with open(m3[0]) as fh:
        first = json.load(fh)
    assert first["superstep"] == first["metrics"]["rounds_in_block"] == 3

    ck = str(tmp_path / "budget")
    bfs_distances(spark, agg_edges, src_df, num_partitions=8, max_iter=4,
                  ckpt_dir=ck, ckpt_every=3)
    steps = sorted(
        int(json.load(open(p))["superstep"])
        for p in glob.glob(os.path.join(ck, "bfs", "manifest_*.json"))
    )
    assert steps == [3, 4]


def test_bfs_fused_resume_equivalence(spark, agg_edges, agg_pdf, tmp_path):
    """Interrupt a fused BFS at a block boundary and resume with a
    DIFFERENT cadence: the monotone-min fixpoint is cadence-independent."""
    srcs = _sources(agg_pdf)[:1]
    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    ck = str(tmp_path / "fresume")
    bfs_distances(spark, agg_edges, src_df, num_partitions=8, max_iter=4,
                  ckpt_dir=ck, ckpt_every=2)
    resumed = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_df, num_partitions=8, ckpt_dir=ck,
            ckpt_every=5,
        ).collect()
    }
    full = {
        r.vid: r.dist
        for r in bfs_distances(
            spark, agg_edges, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "ffull"),
        ).collect()
    }
    assert resumed == full


def test_sssp_fused_equals_unfused(spark, agg_edges, agg_pdf, tmp_path):
    """Bellman-Ford fused rounds: bit-identical to cadence 1 (each
    candidate distance is a path-ordered weight sum regardless of
    cadence) and to the networkx Dijkstra oracle."""
    from reddit_processing_spark.graph.bfs import shortest_paths

    srcs = _sources(agg_pdf)
    src_df = spark.createDataFrame([(v,) for v in srcs], "vid long")
    g = nx.Graph()
    for r in agg_pdf.itertuples():
        if r.src != r.dst:
            w = 1.0 + (int(r.src) % 5) * 0.25
            if g.has_edge(r.src, r.dst):
                w = min(w, g[r.src][r.dst]["w"])
            g.add_edge(r.src, r.dst, w=w)
    # vids are signed hashes: use pmod so the Spark weights match the
    # Python `%` (Spark's `%` keeps the dividend's sign)
    weighted = agg_edges.withColumn(
        "w", F.lit(1.0) + F.pmod(F.col("src"), F.lit(5)).cast("double") * F.lit(0.25)
    )
    base = {
        r.vid: r.dist
        for r in shortest_paths(
            spark, weighted, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "s1"),
        ).collect()
    }
    fused = {
        r.vid: r.dist
        for r in shortest_paths(
            spark, weighted, src_df, num_partitions=8,
            ckpt_dir=str(tmp_path / "s4"), ckpt_every=4,
        ).collect()
    }
    assert fused == base
    want = _nx_multi_dijkstra(g, srcs)
    assert set(fused) == set(want)
    for v, d in want.items():
        assert abs(fused[v] - d) < 1e-9


def test_bfs_fused_truncates_lineage(spark, agg_edges, agg_pdf, tmp_path, monkeypatch):
    """The fused block must plant a lazy localCheckpoint between inner
    rounds — without it each round's 3 state references grow the
    unmaterialized plan ~3^k and Catalyst compile dominates (measured
    8× slower than cadence 1 before the fix). Results alone can't
    catch a removal (it only gets slow), so count the calls."""
    # Spark 4: instances are the classic subclass, which overrides the
    # pyspark.sql.DataFrame facade — patch where the lookup lands
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"n": 0, "eager": []}
    orig = DataFrame.localCheckpoint

    def counting(self, eager=True):
        calls["n"] += 1
        calls["eager"].append(eager)
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", counting)
    srcs = _sources(agg_pdf)[:1]
    src_df = spark.createDataFrame([(srcs[0],)], "vid long")
    bfs_distances(spark, agg_edges, src_df, num_partitions=8, max_iter=6,
                  ckpt_dir=str(tmp_path / "lck"), ckpt_every=3)
    # 2 blocks of 3 rounds -> 2 inner truncations per block
    assert calls["n"] == 4
    assert all(e is False for e in calls["eager"])
