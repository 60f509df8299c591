"""Synchronous label propagation with deterministic tie-breaks.

Spec (ours — the reference has no graph layer; the north_rule demands
"label propagation" with outputs that match exactly across runs and
parallelism levels, which FORCES synchronous updates + a total-order
tie-break; asynchronous LPA is nondeterministic — SURVEY.md §2.11):

- undirected weighted graph (edge weights symmetrized by summing).
- init: label(v) = vid.
- superstep: label'(v) = argmax over neighbor labels of the summed
  incident edge weight; ties broken by the SMALLEST label
  (row_number over (w desc, label asc) — SURVEY.md §2.4 A5, fully
  built-in, no UDAF). Vertices with no neighbors keep their label.
- stop when no label changed or max_iter (synchronous LPA can
  2-cycle on bipartite structures — max_iter is the documented
  guard; the pandas oracle runs the identical schedule).

Frontier-delta (SURVEY.md §2.3 J5): LPA's update is NOT monotone (a
vertex needs ALL neighbor labels, not just changed ones), so the
delta schedule recomputes the AFFECTED SET — vertices with at least
one neighbor whose label changed last superstep — using all their
incident edges; everyone else provably keeps their label (their
neighbor-label multiset is unchanged, so the argmax is unchanged).
Exactness is therefore by construction; per-superstep message volume
(``msg_rows`` in the manifests) shrinks to the active rim as the
graph converges. ``frontier=False`` restores the dense schedule.

Skew (``salt > 1``): explicit two-stage weight sum — partial
``groupBy(nvid, label, slt)`` then final ``groupBy(nvid, label)`` —
bounds any single reduce key's fan-in from a mega-hub (SURVEY §2.11
``salted_repartition``; map-side partial aggregation combines per
task already, the explicit stage is the spill-independent guarantee).

Salted exactness is CONDITIONAL on the weights (round-2 ADVICE):
double summation is not associative, so regrouping by ``_slt`` can in
principle change the rounding of a score ``s`` and flip the argmax at
a near-tie. In this pipeline ``aggregate_edges`` weights are
integer-valued doubles whose partial sums are all exactly
representable (< 2^53), so salted ≡ unsalted bit-exactly (the
equality test asserts it). For arbitrary float weights, salted LPA is
exact only up to float summation order — unlike CC, whose ``min`` is
genuinely associative.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager
from .components import _annotate, _resume_state
from .partitioning import setup_scan

STATE_COLS = {"vid", "label", "chg"}


def symmetrize_weighted(edges: DataFrame) -> DataFrame:
    fwd = edges.select("src", "dst", "w")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    return (
        fwd.unionByName(rev)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 10,
    ckpt_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    salt: int = 1,
    frontier: bool = True,
) -> DataFrame:
    """Returns (vid, label) after synchronous LPA."""
    import tempfile

    # single setup scan: sizing + the weighted-identity fingerprint
    # (weights flip argmaxes, so they're part of the identity) from one
    # aggregate over the raw input; the symmetrized persist
    # materializes inside superstep 1 (round-4 VERDICT #1 pattern).
    P, fp = setup_scan(spark, edges, num_partitions, cols=("src", "dst", "w"))
    salt = max(1, salt)
    ckpt = CheckpointManager(
        ckpt_dir or tempfile.mkdtemp(prefix="lpa_ckpt_"), "lpa", fingerprint=fp
    )

    sym = symmetrize_weighted(edges).repartition(P, "src").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = sym.select(F.col("src").alias("vid")).distinct().persist(StorageLevel.MEMORY_AND_DISK)

    start = 0
    labels = vertices.select("vid", F.col("vid").alias("label"), F.lit(True).alias("chg"))
    if resume:
        state, start = _resume_state(ckpt, spark, STATE_COLS)
        if state is not None:
            labels = state

    for step in range(start, max_iter):
        t0 = time.monotonic()
        if frontier:
            # affected = vertices with >=1 changed neighbor; recompute
            # them from ALL their incident edges (two semi-joins, then
            # the same dense kernel on the shrunken edge set).
            changed_vids = labels.filter("chg").select("vid")
            affected = (
                sym.join(changed_vids, sym.src == changed_vids.vid, "left_semi")
                .select(F.col("dst").alias("vid"))
                .distinct()
            )
            edges_in = sym.join(affected, sym.dst == affected.vid, "left_semi")
        else:
            edges_in = sym
        nbr = edges_in.join(labels, edges_in.src == labels.vid).select(
            edges_in.dst.alias("nvid"), edges_in.src.alias("_src"), "label", "w"
        )
        obs_m = Observation(f"lpa_msgs_{step + 1}")
        nbr = nbr.observe(obs_m, F.count("*").alias("msg_rows"))
        if salt > 1:
            # salt on the SENDER so rows within one hot (nvid, label)
            # group split across partial keys (a mega-hub's neighbors
            # often share one label — salting on label wouldn't split).
            scores = (
                nbr.withColumn("_slt", F.pmod(F.xxhash64("_src"), F.lit(salt)))
                .groupBy("nvid", "label", "_slt")
                .agg(F.sum("w").alias("s"))
                .groupBy("nvid", "label")
                .agg(F.sum("s").alias("s"))
            )
        else:
            scores = nbr.groupBy("nvid", "label").agg(F.sum("w").alias("s"))
        pick = Window.partitionBy("nvid").orderBy(F.col("s").desc(), F.col("label").asc())
        best = (
            scores.withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .select(F.col("nvid").alias("vid"), F.col("label").alias("nlabel"))
        )
        # the old label is already on the row here — fold the changed-
        # count into the write pass with observe(); no follow-up job.
        new = labels.join(best, "vid", "left").select(
            "vid",
            F.coalesce("nlabel", "label").alias("label"),
            (F.coalesce("nlabel", "label") != F.col("label")).alias("chg"),
        )
        obs = Observation(f"lpa_step_{step + 1}")
        observed = new.observe(obs, F.sum(F.col("chg").cast("long")).alias("changed"))
        written = ckpt.write(observed, step + 1)
        changed = int(obs.get["changed"] or 0)
        msg_rows = int(obs_m.get["msg_rows"] or 0)
        _annotate(
            ckpt, step + 1, {"changed": changed, "msg_rows": msg_rows},
            int((time.monotonic() - t0) * 1000),
        )
        labels = written
        if changed == 0:
            break

    sym.unpersist()
    vertices.unpersist()
    return labels.select("vid", "label")
