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
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager
from .components import _annotate


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
) -> DataFrame:
    """Returns (vid, label) after synchronous LPA."""
    import tempfile

    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ckpt = CheckpointManager(ckpt_dir or tempfile.mkdtemp(prefix="lpa_ckpt_"), "lpa")

    sym = symmetrize_weighted(edges).repartition(P, "src").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = sym.select(F.col("src").alias("vid")).distinct().persist(StorageLevel.MEMORY_AND_DISK)

    start = 0
    labels = vertices.select("vid", F.col("vid").alias("label"))
    if resume:
        last = ckpt.latest_valid_step()
        if last is not None:
            start = last
            labels = ckpt.read(spark, last)

    for step in range(start, max_iter):
        t0 = time.monotonic()
        nbr = sym.join(labels, sym.src == labels.vid).select(
            sym.dst.alias("nvid"), "label", "w"
        )
        scores = nbr.groupBy("nvid", "label").agg(F.sum("w").alias("s"))
        pick = Window.partitionBy("nvid").orderBy(F.col("s").desc(), F.col("label").asc())
        best = (
            scores.withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .select(F.col("nvid").alias("vid"), F.col("label").alias("nlabel"))
        )
        # the old label is already on the row here — fold the changed-
        # count into the write pass with observe(); no follow-up job.
        from pyspark.sql import Observation

        new = labels.join(best, "vid", "left").select(
            "vid",
            F.coalesce("nlabel", "label").alias("label"),
            (F.coalesce("nlabel", "label") != F.col("label")).cast("long").alias("_chg"),
        )
        obs = Observation(f"lpa_step_{step + 1}")
        observed = new.observe(obs, F.sum("_chg").alias("changed")).select("vid", "label")
        written = ckpt.write(observed, step + 1)
        changed = int(obs.get["changed"] or 0)
        _annotate(ckpt, step + 1, {"changed": changed}, int((time.monotonic() - t0) * 1000))
        labels = written
        if changed == 0:
            break

    sym.unpersist()
    vertices.unpersist()
    return labels
