"""k-core decomposition (core number per vertex) via synchronous
h-index iteration — the engine's graph-family extension beyond the
contract's four algorithms (SURVEY.md §2.11).

Algorithm (Lü, Zhou, Zhang, Stanley, "The H-index of a network node",
2016 — convergence proof): initialize every vertex's estimate to its
degree; each superstep set ``est(v) ← h-index of its neighbors'
estimates`` (the largest k such that ≥ k neighbors have est ≥ k).
Estimates decrease monotonically to exactly the core numbers.
Synchronous updates + integer arithmetic ⇒ bit-identical results at
any parallelism (SURVEY §4.3).

Spark shape — each superstep is two shuffles and NO skew-prone
wide rows:

1. message: ``sym ⋈ est ON dst`` → (vid, neighbor_est) — |E| rows;
2. histogram: ``groupBy(vid, nest).count()`` — map-side combine
   collapses a mega-hub's fan-in to ≤ |distinct est values| rows per
   vertex (never a per-vertex collect_list);
3. h-index from the histogram with a window: cum = running Σ count
   over nest DESC per vid, h = max(least(nest, cum)) — the classic
   h-index identity, pure built-ins;
4. new est = least(old, h) (monotone guard), changed-count folded
   into the checkpoint write via Observation (no extra job).

Dense schedule: the h-index needs the FULL neighborhood histogram, so
unlike hash-min CC there is no sound frontier-delta without caching
per-vertex histograms between supersteps; message volume is |E| per
round. Rounds to converge are small in practice (≈ a few × the
distance from degrees to cores; 3-6 on the test tiers).

Oracle: exact match vs ``networkx.core_number`` in tests.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager, graph_fingerprint
from .components import _annotate, _resume_state, symmetrize

STATE_COLS = {"vid", "est", "chg"}


def core_numbers(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 100,
    ckpt_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
) -> DataFrame:
    """Returns (vid, core) — the core number of every vertex of the
    undirected simple graph underlying ``edges``."""
    import tempfile

    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ckpt = CheckpointManager(
        ckpt_dir or tempfile.mkdtemp(prefix="kcore_ckpt_"), "kcore"
    )

    sym = symmetrize(edges).repartition(P, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ckpt.fingerprint = graph_fingerprint(sym)

    start = 0
    est = (
        sym.groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").cast("long").alias("est"))
        .withColumn("chg", F.lit(True))
    )
    if resume:
        state, start = _resume_state(ckpt, spark, STATE_COLS)
        if state is not None:
            est = state

    w = (
        Window.partitionBy("vid")
        .orderBy(F.col("nest").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    changed = 0
    for step in range(start, max_iter):
        t0 = time.monotonic()
        msgs = sym.join(est, sym.dst == est.vid).select(
            sym.src.alias("vid"), F.col("est").alias("nest")
        )
        obs_m = Observation(f"kcore_msgs_{step + 1}")
        msgs = msgs.observe(obs_m, F.count("*").alias("msg_rows"))
        hist = msgs.groupBy("vid", "nest").agg(F.count("*").alias("cnt"))
        hvals = (
            hist.withColumn("cum", F.sum("cnt").over(w))
            .groupBy("vid")
            .agg(F.max(F.least(F.col("nest"), F.col("cum"))).alias("h"))
        )
        new = (
            est.select("vid", F.col("est").alias("oest"))
            .join(hvals, "vid")  # every vertex has ≥1 neighbor in sym
            .select(
                "vid",
                F.least(F.col("oest"), F.col("h")).alias("est"),
                (F.least(F.col("oest"), F.col("h")) != F.col("oest")).alias("chg"),
            )
        )
        obs = Observation(f"kcore_step_{step + 1}")
        observed = new.observe(obs, F.sum(F.col("chg").cast("long")).alias("changed"))
        written = ckpt.write(observed, step + 1)
        changed = int(obs.get["changed"] or 0)
        msg_rows = int(obs_m.get["msg_rows"] or 0)
        _annotate(
            ckpt, step + 1, {"changed": changed, "msg_rows": msg_rows},
            int((time.monotonic() - t0) * 1000),
        )
        est = written
        if changed == 0:
            break
    if changed > 0:
        # max_iter exhausted while estimates were still decreasing:
        # the returned values are UPPER BOUNDS, not core numbers —
        # say so instead of returning plausible-looking wrong values
        # (same contract as connected_components_star's
        # rounds-exhausted warning).
        import warnings

        warnings.warn(
            f"core_numbers: h-index iteration did not converge within "
            f"max_iter={max_iter} (last superstep still changed "
            f"{changed} estimates); returned values are upper bounds "
            "on the true core numbers — raise max_iter",
            stacklevel=2,
        )

    sym.unpersist()
    return est.select("vid", F.col("est").alias("core"))
