"""Personalized PageRank + HITS oracles (SURVEY.md §2.11).

- PPR: allclose 1e-6 vs the numpy oracle extended with networkx
  ``_pagerank_scipy`` personalization semantics (normalized teleport
  vector, dangling mass redistributed by the same vector).
- HITS: allclose 1e-6 vs the pure-numpy power-iteration oracle
  (networkx's hits() needs scipy ARPACK — absent in this sandbox; the
  oracle implements the textbook iteration it converges to).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle.hits import hits as ohits
from oracle.pagerank import pagerank as opr
from reddit_processing_spark.graph.hits import HITS
from reddit_processing_spark.graph.pagerank import PageRank
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


def _pers_weights(agg_pdf) -> dict[int, float]:
    """Deterministic non-uniform teleport over ~1/3 of the vertices."""
    vids = sorted(
        set(agg_pdf["src"].tolist()) | set(agg_pdf["dst"].tolist())
    )
    return {v: 1.0 + (v % 7) for v in vids if v % 3 == 0}


def test_ppr_matches_oracle(spark, agg_edges, agg_pdf, tmp_path):
    pers = _pers_weights(agg_pdf)
    pdf = spark.createDataFrame(
        [(v, w) for v, w in pers.items()], "vid long, p double"
    )
    pr = PageRank(
        spark, agg_edges, num_partitions=8, kernel="csr", personalization=pdf
    )
    try:
        ranks = pr.run(d=0.85, tol=1e-9, max_iter=500, ckpt_dir=str(tmp_path / "ppr"))
        got = {r.vid: r.rank for r in ranks.collect()}
    finally:
        pr.unpersist()
    want = opr(agg_pdf, alpha=0.85, tol=1e-13, personalization=pers)
    assert got.keys() == want.keys()
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation
    # the teleport set demonstrably gains mass vs uniform PageRank
    uniform = opr(agg_pdf, alpha=0.85, tol=1e-13)
    in_set = sum(got[v] for v in pers)
    in_set_uniform = sum(uniform[v] for v in pers)
    assert in_set > in_set_uniform * 1.1


def test_ppr_kernels_agree(spark, agg_edges, agg_pdf, tmp_path):
    pers = _pers_weights(agg_pdf)
    pdf = spark.createDataFrame(
        [(v, w) for v, w in pers.items()], "vid long, p double"
    )
    outs = {}
    for kernel in ("csr", "sql"):
        pr = PageRank(
            spark, agg_edges, num_partitions=8, kernel=kernel, personalization=pdf
        )
        try:
            ranks = pr.run(
                d=0.85, tol=1e-8, max_iter=300,
                ckpt_dir=str(tmp_path / f"ppr_{kernel}"),
            )
            outs[kernel] = {r.vid: r.rank for r in ranks.collect()}
        finally:
            pr.unpersist()
    assert outs["csr"].keys() == outs["sql"].keys()
    assert max(abs(outs["csr"][v] - outs["sql"][v]) for v in outs["csr"]) < 1e-9


def test_ppr_zero_mass_raises(spark, agg_edges):
    # weights over vids absent from the graph sum to zero after the
    # vertex join — must refuse loudly, not divide by zero
    pdf = spark.createDataFrame([(-(10**9), 1.0)], "vid long, p double")
    with pytest.raises(ValueError, match="sum to zero"):
        PageRank(spark, agg_edges, num_partitions=8, personalization=pdf)


def test_hits_matches_oracle(spark, agg_edges, agg_pdf, tmp_path):
    h = HITS(spark, agg_edges, num_partitions=8)
    try:
        out = h.run(tol=1e-10, max_iter=2000, ckpt_dir=str(tmp_path / "hits"))
        rows = out.collect()
    finally:
        h.unpersist()
    got_h = {r.vid: r.hub for r in rows}
    got_a = {r.vid: r.auth for r in rows}
    want_h, want_a = ohits(agg_pdf, tol=1e-13, max_iter=20000)
    assert got_h.keys() == want_h.keys()
    assert max(abs(got_h[v] - want_h[v]) for v in want_h) < 1e-6
    assert max(abs(got_a[v] - want_a[v]) for v in want_a) < 1e-6
    assert abs(sum(got_h.values()) - 1.0) < 1e-9
    assert abs(sum(got_a.values()) - 1.0) < 1e-9


def test_hits_resume_equivalence(spark, agg_edges, tmp_path):
    """Kill after 2 supersteps, resume from checkpoint, and the
    continued run equals an uninterrupted one within float
    associativity (1e-12 per component — Spark randomizes
    shuffle-block fetch order, so double message sums can differ at
    the ULP between ANY two executions; the resume path contributes
    no divergence beyond that envelope because its literal divisors
    are the original run's exact manifest scalars). Same contract as
    the PageRank/Katz resume tests."""
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "part")

    h1 = HITS(spark, agg_edges, num_partitions=8)
    try:
        full = {
            (r.vid): (r.hub, r.auth)
            for r in h1.run(tol=0, max_iter=6, ckpt_dir=full_dir).collect()
        }
        h1.run(tol=0, max_iter=2, ckpt_dir=part_dir)  # "killed" at step 2
        resumed = {
            (r.vid): (r.hub, r.auth)
            for r in h1.run(tol=0, max_iter=6, ckpt_dir=part_dir).collect()
        }
    finally:
        h1.unpersist()
    assert resumed.keys() == full.keys()
    assert max(abs(resumed[v][0] - full[v][0]) for v in full) < 1e-12
    assert max(abs(resumed[v][1] - full[v][1]) for v in full) < 1e-12


def test_ppr_changed_teleport_rejects_stale_checkpoint(spark, agg_edges, agg_pdf, tmp_path):
    """A PPR fixpoint is a function of (graph, teleport vector): the
    fingerprint mixes the vector in, so resuming a ckpt_dir written
    with a DIFFERENT teleport vector restarts from superstep 0 instead
    of converging to the old vector's fixpoint (round-3 ADVICE)."""
    pers_a = _pers_weights(agg_pdf)
    pers_b = {v: w * (1.0 + (v % 5)) for v, w in pers_a.items()}
    pdf_a = spark.createDataFrame(
        [(v, w) for v, w in pers_a.items()], "vid long, p double"
    )
    pdf_b = spark.createDataFrame(
        [(v, w) for v, w in pers_b.items()], "vid long, p double"
    )
    shared = str(tmp_path / "shared")

    pr_a = PageRank(
        spark, agg_edges, num_partitions=8, kernel="sql", personalization=pdf_a
    )
    try:
        pr_a.run(d=0.85, tol=1e-8, max_iter=200, ckpt_dir=shared)
    finally:
        pr_a.unpersist()

    pr_b = PageRank(
        spark, agg_edges, num_partitions=8, kernel="sql", personalization=pdf_b
    )
    try:
        with pytest.warns(UserWarning, match="DIFFERENT input graph"):
            got = {
                r.vid: r.rank
                for r in pr_b.run(
                    d=0.85, tol=1e-8, max_iter=200, ckpt_dir=shared
                ).collect()
            }
    finally:
        pr_b.unpersist()

    want = opr(agg_pdf, alpha=0.85, tol=1e-12, personalization=pers_b)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-5
