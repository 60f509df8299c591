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

Scheduling: the h-index needs the FULL neighborhood histogram, so
incremental MESSAGES are unsound (you can't update an h-index from
deltas alone) — but AFFECTED-SET scheduling is sound, the same
argument LPA uses (graph/lpa.py): a vertex whose neighbors' estimates
all kept their value has an unchanged histogram, hence an unchanged
h, and since ``est = least(old, h)`` its estimate provably keeps its
value too. Each round therefore recomputes ONLY vertices with ≥ 1
changed neighbor, sending them ALL their neighbors' estimates (two
semi-joins restrict the persisted edge set; the changed side shrinks
fast, so AQE turns those semi-joins into broadcast probes of the
persisted partitions — no |E| shuffle). Everyone else keeps their
estimate with no message at all. ``frontier=False`` restores the
dense schedule; frontier ≡ dense equality is asserted in tests.

Convergence can need many rounds on hub-heavy graphs (the bench tier
measured 86 — estimates ripple down one h-step at a time), which is
exactly why the dense schedule's |E|-messages-per-round was the most
expensive thing in the round-3 bench and the affected-set schedule
matters: per-round message volume tracks the active rim
(``msg_rows`` in the manifests), not |E|.

Oracle: exact match vs ``networkx.core_number`` in tests.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager
from .components import _annotate, _resume_state, symmetrize
from .partitioning import setup_scan

STATE_COLS = {"vid", "est", "chg"}


def core_numbers(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 100,
    ckpt_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    frontier: bool = True,
    ckpt_every: int = 1,
) -> DataFrame:
    """Returns (vid, core) — the core number of every vertex of the
    undirected simple graph underlying ``edges``.

    ``ckpt_every`` (superstep fusion): compose that many synchronous
    h-index rounds into ONE Spark job and checkpoint only the last.
    Sound because the synchronous update is deterministic (fused ≡
    unfused is asserted in tests) and because a converged inner round
    is idempotent (empty frontier ⇒ no messages ⇒ est unchanged), so
    checking convergence at block granularity merely risks ≤
    ``ckpt_every − 1`` free no-op rounds. The trade-offs are explicit:
    resume granularity and per-round delta metrics coarsen to the
    block, which is why the contract's four core algorithms (PageRank
    / CC / LPA / triangles — "every superstep checkpoints",
    BASELINE.json north_rule) keep cadence 1 and this extension
    algorithm exposes the knob. h-index convergence ripples one
    h-step per round (86 rounds at the bench tier) while each round's
    real work shrinks with the frontier, so the wall is dominated by
    the fixed per-job floor (scheduling + parquet write + read-back)
    — fusion divides exactly that term.
    """
    import tempfile

    if ckpt_every < 1:
        raise ValueError(f"ckpt_every must be >= 1, got {ckpt_every}")

    # single setup scan: sizing + resume fingerprint in one aggregate
    # over the raw input (round-4 VERDICT #1 pattern); the symmetrized
    # persist materializes inside round 1.
    P, fp = setup_scan(spark, edges, num_partitions)
    ckpt = CheckpointManager(
        ckpt_dir or tempfile.mkdtemp(prefix="kcore_ckpt_"), "kcore",
        fingerprint=fp,
    )

    sym = symmetrize(edges).repartition(P, "src").persist(StorageLevel.MEMORY_AND_DISK)

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
    def _round(est: DataFrame, obs_m: Observation | None) -> DataFrame:
        """One synchronous h-index update as a plan transform —
        chainable without materialization (superstep fusion)."""
        if frontier:
            # affected set = vertices with ≥1 neighbor whose estimate
            # changed last round; recompute them from ALL their
            # incident edges (full histogram — incremental messages
            # would be unsound), keep everyone else's estimate. Sound
            # by the LPA argument: an unchanged neighborhood multiset
            # ⇒ unchanged h ⇒ least(old, h) = old.
            changed_vids = est.filter("chg").select("vid")
            affected = (
                sym.join(changed_vids, sym.dst == changed_vids.vid, "left_semi")
                .select(F.col("src").alias("vid"))
                .distinct()
            )
            edges_in = sym.join(affected, sym.src == affected.vid, "left_semi")
        else:
            edges_in = sym
        msgs = edges_in.join(est, edges_in.dst == est.vid).select(
            edges_in.src.alias("vid"), F.col("est").alias("nest")
        )
        if obs_m is not None:
            msgs = msgs.observe(obs_m, F.count("*").alias("msg_rows"))
        hist = msgs.groupBy("vid", "nest").agg(F.count("*").alias("cnt"))
        hvals = (
            hist.withColumn("cum", F.sum("cnt").over(w))
            .groupBy("vid")
            .agg(F.max(F.least(F.col("nest"), F.col("cum"))).alias("h"))
        )
        return (
            est.select("vid", F.col("est").alias("oest"))
            # left: unaffected vertices get no h row this round and
            # provably keep their estimate (dense mode: h never null —
            # every vertex has ≥1 neighbor in sym, so this reduces to
            # the inner join it used to be)
            .join(hvals, "vid", "left")
            .select(
                "vid",
                F.least(F.col("oest"), F.coalesce("h", F.col("oest"))).alias("est"),
                (F.coalesce("h", F.col("oest")) < F.col("oest")).alias("chg"),
            )
        )

    changed = 0
    rounds = start
    while rounds < max_iter:
        t0 = time.monotonic()
        block = min(ckpt_every, max_iter - rounds)
        obs_m = Observation(f"kcore_msgs_{rounds + block}")
        for i in range(block):
            # message metrics ride the LAST fused round (the one whose
            # frontier the next block resumes from)
            est = _round(est, obs_m if i == block - 1 else None)
            if i < block - 1:
                # truncate lineage between fused rounds WITHOUT a job:
                # each round references est three-plus times (frontier
                # delta, message join, old-estimate join), so an
                # unmaterialized k-round chain is ~3^k logical-plan
                # copies and Catalyst compile time dominates the block
                # (measured: cadence 4 was 8× SLOWER than cadence 1 at
                # the small tier before this). A lazy localCheckpoint
                # plants an RDD leaf per round — constant compile cost
                # — and materializes inside the block's single action;
                # fault-tolerance loss is bounded by the parquet
                # checkpoint at block end.
                est = est.localCheckpoint(eager=False)
        obs = Observation(f"kcore_step_{rounds + block}")
        observed = est.observe(obs, F.sum(F.col("chg").cast("long")).alias("changed"))
        # step index = cumulative ROUND count, so manifests stay
        # directly comparable across cadences and resume restarts at
        # the right round budget.
        written = ckpt.write(observed, rounds + block)
        changed = int(obs.get["changed"] or 0)
        # When every inner round after some point has an EMPTY frontier
        # (the block overshot convergence), AQE's empty-relation
        # propagation prunes the CollectMetrics node obs_m rides and
        # its .get raises from the JVM — which happens exactly when
        # the observed message stream was empty, so 0 is the true
        # value, not a guess.
        try:
            msg_rows = int(obs_m.get["msg_rows"] or 0)
        except Exception:
            msg_rows = 0
        _annotate(
            ckpt, rounds + block,
            {"changed": changed, "msg_rows": msg_rows, "rounds_in_block": block},
            int((time.monotonic() - t0) * 1000),
        )
        est = written
        rounds += block
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
