"""k-core decomposition: exact parity vs networkx.core_number on the
transcript fixture graph and a hand-built graph with known cores;
parallelism invariance; resume equivalence."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.graph.kcore import core_numbers
from reddit_processing_spark.operators.extract import aggregate_edges, derive_edges


@pytest.fixture(scope="module")
def agg_edges(spark, tiny_dir):
    edges, _ = derive_edges(spark.read.parquet(tiny_dir))
    agg = aggregate_edges(edges).cache()
    agg.count()
    return agg


def _nx_cores(agg_pdf):
    g = nx.Graph()
    for r in agg_pdf.itertuples():
        if r.src != r.dst:
            g.add_edge(r.src, r.dst)
    return nx.core_number(g)


def test_kcore_matches_networkx_on_fixture(spark, agg_edges, tmp_path):
    got = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=str(tmp_path / "kc"), num_partitions=8
        ).collect()
    }
    want = _nx_cores(agg_edges.toPandas())
    assert got == want


def test_kcore_known_graph(spark, tmp_path):
    """K4 (core 3) + a path tail (core 1) + a C4 cycle (core 2)."""
    e = []
    k4 = [10, 11, 12, 13]
    e += [(a, b) for i, a in enumerate(k4) for b in k4[i + 1:]]
    e += [(13, 20), (20, 21)]              # tail off the clique
    e += [(30, 31), (31, 32), (32, 33), (33, 30)]  # 4-cycle
    df = spark.createDataFrame(e, "src long, dst long")
    got = {
        r.vid: r.core
        for r in core_numbers(
            spark, df, ckpt_dir=str(tmp_path / "kg"), num_partitions=4
        ).collect()
    }
    g = nx.Graph(e)
    assert got == nx.core_number(g)
    assert all(got[v] == 3 for v in k4)
    assert got[20] == got[21] == 1
    assert all(got[v] == 2 for v in (30, 31, 32, 33))


def test_kcore_warns_when_not_converged(spark, tmp_path):
    """max_iter exhausted mid-contraction ⇒ the values are upper
    bounds, not cores — the call must say so (same contract as
    cc_star's rounds-exhausted warning)."""
    import warnings

    # long path: degree-2 interior needs several h-index rounds to
    # contract to core 1
    e = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(e, "src long, dst long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        core_numbers(spark, df, max_iter=1, ckpt_dir=str(tmp_path / "nc"))
    assert any("did not converge" in str(x.message) for x in w)


def test_kcore_parallelism_invariant(spark, agg_edges, tmp_path):
    a = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=str(tmp_path / "a"), num_partitions=4
        ).collect()
    }
    b = {
        r.vid: r.core
        for r in core_numbers(
            spark,
            agg_edges.repartition(13),
            ckpt_dir=str(tmp_path / "b"),
            num_partitions=16,
        ).collect()
    }
    assert a == b


def test_kcore_resume_equivalence(spark, agg_edges, tmp_path):
    """Run 2 supersteps, then resume in a fresh call from the same
    ckpt_dir: the final cores equal an uninterrupted run."""
    ck = str(tmp_path / "resume")
    core_numbers(spark, agg_edges, max_iter=2, ckpt_dir=ck, num_partitions=8)
    resumed = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=ck, num_partitions=8
        ).collect()
    }
    full = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=str(tmp_path / "full"), num_partitions=8
        ).collect()
    }
    assert resumed == full


def test_kcore_frontier_equals_dense_per_superstep(spark, agg_edges, tmp_path):
    """The affected-set schedule is EXACT, not approximate: every
    superstep's full estimate table is bit-identical to the dense
    schedule's (the LPA soundness argument), and the frontier run's
    per-round message volume shrinks to the active rim while dense
    stays at |E|."""
    import glob
    import json
    import os

    dd, fd = str(tmp_path / "dense"), str(tmp_path / "front")
    dense = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=dd, num_partitions=8, frontier=False
        ).collect()
    }
    front = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=fd, num_partitions=8, frontier=True
        ).collect()
    }
    assert front == dense

    d_steps = sorted(glob.glob(os.path.join(dd, "kcore", "step=*")))
    f_steps = sorted(glob.glob(os.path.join(fd, "kcore", "step=*")))
    assert len(d_steps) == len(f_steps) >= 2
    for ds, fs in zip(d_steps, f_steps):
        a = {r.vid: (r.est, r.chg) for r in spark.read.parquet(ds).collect()}
        b = {r.vid: (r.est, r.chg) for r in spark.read.parquet(fs).collect()}
        assert a == b, f"state diverged at {os.path.basename(ds)}"

    def msg_rows(d):
        out = []
        for p in sorted(glob.glob(os.path.join(d, "kcore", "manifest_*.json"))):
            with open(p) as fh:
                out.append(json.load(fh)["metrics"]["msg_rows"])
        return out

    dm, fm = msg_rows(dd), msg_rows(fd)
    assert all(x == dm[0] for x in dm)       # dense: |E| every round
    assert fm[0] == dm[0]                    # round 1: everyone changed
    assert fm[-1] < dm[-1]                   # converged rim << |E|
    assert sum(fm) < sum(dm)

def test_kcore_fused_equals_unfused(spark, agg_edges, tmp_path):
    """ckpt_every > 1 composes synchronous rounds into one job —
    results must be identical to cadence 1 (and to networkx), the
    checkpoint step indices must count ROUNDS (comparable across
    cadences), and fusion must actually reduce the job count (fewer
    checkpoints on disk)."""
    import glob
    import json
    import os

    base = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=str(tmp_path / "c1"), num_partitions=8
        ).collect()
    }
    fused = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=str(tmp_path / "c3"), num_partitions=8,
            ckpt_every=3,
        ).collect()
    }
    assert fused == base == _nx_cores(agg_edges.toPandas())

    m1 = sorted(glob.glob(os.path.join(str(tmp_path / "c1"), "kcore", "manifest_*.json")))
    m3 = sorted(glob.glob(os.path.join(str(tmp_path / "c3"), "kcore", "manifest_*.json")))
    assert len(m3) < len(m1)
    with open(m3[0]) as fh:
        first = json.load(fh)
    assert first["superstep"] == first["metrics"]["rounds_in_block"] == 3

    # round budgets are exact even when not a multiple of the cadence:
    # max_iter=4 at cadence 3 runs blocks of 3 then 1
    ck = str(tmp_path / "budget")
    core_numbers(spark, agg_edges, max_iter=4, ckpt_dir=ck, num_partitions=8,
                 ckpt_every=3)
    steps = sorted(
        int(json.load(open(p))["superstep"])
        for p in glob.glob(os.path.join(ck, "kcore", "manifest_*.json"))
    )
    assert steps == [3, 4]


def test_kcore_fused_resume_equivalence(spark, agg_edges, tmp_path):
    """Interrupt a fused run at a block boundary and resume with a
    DIFFERENT cadence: the fixpoint is cadence-independent."""
    ck = str(tmp_path / "fresume")
    core_numbers(spark, agg_edges, max_iter=4, ckpt_dir=ck, num_partitions=8,
                 ckpt_every=2)
    resumed = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=ck, num_partitions=8, ckpt_every=5
        ).collect()
    }
    full = {
        r.vid: r.core
        for r in core_numbers(
            spark, agg_edges, ckpt_dir=str(tmp_path / "ffull"), num_partitions=8
        ).collect()
    }
    assert resumed == full


def test_kcore_fused_invalid_cadence(spark, agg_edges):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        core_numbers(spark, agg_edges, ckpt_every=0)
