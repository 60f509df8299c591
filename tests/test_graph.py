"""Graph algorithm oracles (SURVEY.md §5.3-5.4).

- PageRank: allclose atol 1e-6 vs the numpy power-iteration oracle
  (BASELINE.json: allclose 1e-6); mass conservation; kernel ('csr' vs
  'sql') and salted-vs-unsalted equivalence; mid-iteration resume.
- Connected components: exact vs networkx (comp label = min vid).
- LPA: exact vs the pandas synchronous oracle.
- Triangles: exact vs networkx.triangles, both orientations.
"""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from oracle.lpa import label_propagation as olpa
from oracle.pagerank import pagerank as opr
from reddit_processing_spark.graph.components import connected_components
from reddit_processing_spark.graph.lpa import label_propagation
from reddit_processing_spark.graph.pagerank import PageRank
from reddit_processing_spark.graph.triangles import triangle_count
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
def nx_graph(agg_pdf):
    g = nx.Graph()
    for r in agg_pdf.itertuples():
        if r.src != r.dst:
            g.add_edge(r.src, r.dst)
    return g


def test_pagerank_matches_oracle(spark, agg_edges, agg_pdf, tmp_path):
    pr = PageRank(spark, agg_edges, num_partitions=8, kernel="csr")
    try:
        ranks = pr.run(d=0.85, tol=1e-8, max_iter=300, ckpt_dir=str(tmp_path / "pr"))
        got = {r.vid: r.rank for r in ranks.collect()}
    finally:
        pr.unpersist()
    want = opr(agg_pdf, alpha=0.85, tol=1e-13)
    assert got.keys() == want.keys()
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation


def test_pagerank_kernels_and_salt_agree(spark, agg_edges, tmp_path):
    outs = {}
    for name, kw in {
        "csr": dict(kernel="csr", salt=1),
        "sql": dict(kernel="sql", salt=1),
        "csr_salted": dict(kernel="csr", salt=4),
    }.items():
        pr = PageRank(spark, agg_edges, num_partitions=8, **kw)
        try:
            ranks = pr.run(d=0.85, tol=1e-6, max_iter=100, ckpt_dir=str(tmp_path / name))
            outs[name] = {r.vid: r.rank for r in ranks.collect()}
        finally:
            pr.unpersist()
    base = outs["csr"]
    for name in ("sql", "csr_salted"):
        assert outs[name].keys() == base.keys()
        assert max(abs(outs[name][v] - base[v]) for v in base) < 1e-9, name


def test_pagerank_resume_equivalence(spark, agg_edges, tmp_path):
    """Kill after 3 supersteps; resumed run must equal uninterrupted."""
    full_dir, part_dir = str(tmp_path / "full"), str(tmp_path / "part")
    pr = PageRank(spark, agg_edges, num_partitions=8, kernel="csr")
    try:
        full = {
            r.vid: r.rank
            for r in pr.run(d=0.85, tol=1e-7, max_iter=100, ckpt_dir=full_dir).collect()
        }
        pr.run(d=0.85, tol=1e-7, max_iter=3, ckpt_dir=part_dir)  # "killed" run
        resumed = {
            r.vid: r.rank
            for r in pr.run(d=0.85, tol=1e-7, max_iter=100, ckpt_dir=part_dir).collect()
        }
    finally:
        pr.unpersist()
    assert resumed.keys() == full.keys()
    assert max(abs(resumed[v] - full[v]) for v in full) < 1e-12

    # manifests carry per-partition lineage + delta metrics
    import json
    import glob

    manifests = sorted(glob.glob(f"{part_dir}/pagerank/manifest_*.json"))
    assert manifests
    m = json.load(open(manifests[-1]))
    assert m["partitions"] and all("rows" in p and "bytes" in p for p in m["partitions"])
    assert "delta" in m["metrics"] and m["wall_ms"] >= 0


def test_connected_components_exact(spark, agg_edges, nx_graph, tmp_path):
    comps = connected_components(
        spark, agg_edges, ckpt_dir=str(tmp_path / "cc"), num_partitions=8
    )
    got = {r.vid: r.comp for r in comps.collect()}
    want_sets = list(nx.connected_components(nx_graph))
    assert len(got) == nx_graph.number_of_nodes()
    for comp_set in want_sets:
        labels = {got[v] for v in comp_set}
        assert labels == {min(comp_set)}


def test_lpa_exact_vs_oracle(spark, agg_edges, agg_pdf, tmp_path):
    labels = label_propagation(
        spark, agg_edges, max_iter=7, ckpt_dir=str(tmp_path / "lpa"), num_partitions=8
    )
    got = {r.vid: r.label for r in labels.collect()}
    want = olpa(agg_pdf, max_iter=7)
    assert got == want


def test_triangles_exact(spark, agg_edges, nx_graph):
    for oriented in (True, False):
        tri = triangle_count(spark, agg_edges, degree_oriented=oriented)
        got = {r.vid: r.tri for r in tri.collect()}
        want = nx.triangles(nx_graph)
        assert got == {int(k): int(v) for k, v in want.items()}, f"oriented={oriented}"
