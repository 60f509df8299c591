"""Strongly connected components (directed graph): exact partition
parity vs networkx.strongly_connected_components on the transcript
fixture graph and hand-built graphs; parallelism invariance; resume
equivalence at outer-round granularity; trim-only (pure DAG) path."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.graph.scc import strongly_connected_components
from reddit_processing_spark.operators.extract import aggregate_edges, derive_edges


@pytest.fixture(scope="module")
def agg_edges(spark, tiny_dir):
    edges, _ = derive_edges(spark.read.parquet(tiny_dir))
    agg = aggregate_edges(edges).cache()
    agg.count()
    return agg


def _partition(rows) -> set[frozenset]:
    by = {}
    for vid, scc in rows:
        assert scc is not None
        by.setdefault(scc, set()).add(vid)
    # the SCC id must be the smallest member (documented contract)
    for scc, members in by.items():
        assert scc == min(members)
    return {frozenset(m) for m in by.values()}


def _nx_partition(g) -> set[frozenset]:
    return {frozenset(c) for c in nx.strongly_connected_components(g)}


def test_scc_matches_networkx_on_fixture(spark, agg_edges, tmp_path):
    got = strongly_connected_components(
        spark, agg_edges, ckpt_dir=str(tmp_path / "scc")
    ).collect()
    g = nx.DiGraph()
    pdf = agg_edges.toPandas()
    for r in pdf.itertuples():
        g.add_edge(r.src, r.dst)
    assert _partition([(r.vid, r.scc) for r in got]) == _nx_partition(g)


def test_scc_known_graph(spark, tmp_path):
    """Two cycles bridged one-way + a DAG tail: C1={1,2,3} (cycle),
    C2={10,11} (2-cycle), bridge 3→10 (one-way, so C1 and C2 stay
    separate), tail 11→20→21 (singletons)."""
    e = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (3, 10), (11, 20), (20, 21)]
    df = spark.createDataFrame(e, "src long, dst long")
    got = strongly_connected_components(
        spark, df, ckpt_dir=str(tmp_path / "kg")
    ).collect()
    parts = _partition([(r.vid, r.scc) for r in got])
    assert parts == {
        frozenset({1, 2, 3}),
        frozenset({10, 11}),
        frozenset({20}),
        frozenset({21}),
    }


def test_scc_pure_dag_is_all_singletons(spark, tmp_path):
    """A 40-chain: trim-to-fixpoint must peel it without the
    propagation phase ever extracting (one outer round)."""
    import glob
    import json
    import os

    e = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(e, "src long, dst long")
    ck = str(tmp_path / "dag")
    got = strongly_connected_components(spark, df, ckpt_dir=ck).collect()
    assert _partition([(r.vid, r.scc) for r in got]) == {
        frozenset({i}) for i in range(41)
    }
    manifests = sorted(glob.glob(os.path.join(ck, "scc", "manifest_*.json")))
    assert len(manifests) == 1  # one outer round
    m = json.load(open(manifests[0]))
    assert m["metrics"]["trimmed"] == 41
    assert m["metrics"]["extracted"] == 0


def test_scc_self_loop_only_vertex_is_singleton(spark, tmp_path):
    e = [(1, 2), (2, 1), (5, 5)]
    df = spark.createDataFrame(e, "src long, dst long")
    got = strongly_connected_components(
        spark, df, ckpt_dir=str(tmp_path / "sl")
    ).collect()
    assert _partition([(r.vid, r.scc) for r in got]) == {
        frozenset({1, 2}),
        frozenset({5}),
    }


def test_scc_parallelism_invariant(spark, agg_edges, tmp_path):
    a = sorted(
        (r.vid, r.scc)
        for r in strongly_connected_components(
            spark, agg_edges, num_partitions=4, ckpt_dir=str(tmp_path / "a")
        ).collect()
    )
    b = sorted(
        (r.vid, r.scc)
        for r in strongly_connected_components(
            spark,
            agg_edges.repartition(13),
            num_partitions=16,
            ckpt_dir=str(tmp_path / "b"),
        ).collect()
    )
    assert a == b


def test_scc_resume_equivalence(spark, agg_edges, tmp_path):
    """Kill after the first outer round, resume from the same
    ckpt_dir: final partition equals an uninterrupted run."""
    ck = str(tmp_path / "resume")
    strongly_connected_components(spark, agg_edges, max_outer=1, ckpt_dir=ck)
    resumed = sorted(
        (r.vid, r.scc)
        for r in strongly_connected_components(
            spark, agg_edges, ckpt_dir=ck
        ).collect()
    )
    full = sorted(
        (r.vid, r.scc)
        for r in strongly_connected_components(
            spark, agg_edges, ckpt_dir=str(tmp_path / "full")
        ).collect()
    )
    assert resumed == full
