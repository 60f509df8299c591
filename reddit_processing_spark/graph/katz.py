"""Katz centrality as an iterative DataFrame program (SURVEY.md
§2.11 ranking family, next to PageRank/HITS).

Power iteration on the attenuated walk sum::

    x ← α·Aᵀx + β        (x₀ = 0)

i.e. ``new[v] = α · Σ_{u→v} w(u,v)·old[u] + β`` — exactly the
iteration ``networkx.katz_centrality`` runs (pure-python there, so it
is usable as an oracle without scipy). Convergence when the L1 change
drops below ``V·tol`` (networkx's criterion), then one final L2
normalization, both matching networkx so parity is per-vertex
``allclose``. Requires ``α < 1/λ_max`` (the caller's contract, as in
networkx — divergence is reported by non-convergence, and the
monotone-growth guard below turns the classic α-too-large blowup into
a loud error instead of max_iter wasted supersteps).

Scale shape (100 TB design): the edge table is hash-partitioned by
``src`` ONCE at setup and persisted; every superstep's only wide
exchanges are the |V|-row state shuffle into that join
(SHUFFLE_HASH-hinted so the persisted edge side never re-shuffles)
and the message groupBy(dst). β needs no join — it is a literal added
to every vertex — and unlike HITS no mid-superstep normalization
scalar is needed, so the L1 delta folds into the checkpoint write via
Observation (zero extra jobs per superstep). Checkpoints stamp a
fingerprint mixing the edge set WITH (α, β): resuming a ckpt_dir
written under different Katz parameters must restart, not silently
converge to the old parameters' fixpoint (the personalized-PageRank
lesson — a checkpoint's identity is the whole problem instance, not
just the graph).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager, mix_fingerprint
from .pagerank import _vertices_from_edges
from .partitioning import resolve_partitions


class Katz:
    """Prepared Katz centrality over an aggregated (src, dst, w)
    edge table."""

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        num_partitions: int | None = None,
    ):
        self.spark = spark
        self._own_edges = not (
            edges.storageLevel.useMemory or edges.storageLevel.useDisk
        )
        edges = (
            edges.persist(StorageLevel.MEMORY_AND_DISK)
            if self._own_edges
            else edges
        )
        self._edges_in = edges
        self.P = resolve_partitions(spark, edges, num_partitions)

        self.vertices = _vertices_from_edges(edges).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        e = edges.select("src", "dst", F.col("w").cast("double").alias("w"))
        self.e_src = e.repartition(self.P, "src").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        vrow = self.vertices.agg(F.count("*").alias("v")).collect()[0]
        self.V = int(vrow["v"])
        erow = self.e_src.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst", "w")), F.lit(0)).alias(
                "h"
            ),
        ).collect()[0]
        self.E = int(erow["n"])
        self._graph_h = int(erow["h"])

    def _fingerprint(self, alpha: float, beta: float) -> int:
        """Problem-instance identity: edge set × (α, β). Floats are
        mixed via their IEEE bit patterns so 0.1 and a rounding
        neighbor fingerprint differently. The 128-bit (α, β) pattern
        is FOLDED to 64 bits before masking — masking the raw 128-bit
        int would keep only β's low bits and let a checkpoint written
        under a different α resume silently (round-4 ADVICE)."""
        import struct

        pbits = int.from_bytes(
            struct.pack(">dd", float(alpha), float(beta)), "big", signed=False
        )
        pbits = (pbits >> 64) ^ (pbits & ((1 << 64) - 1))
        return mix_fingerprint(self.E, self._graph_h ^ (pbits & 0x7FFFFFFFFFFFFFFF))

    def run(
        self,
        alpha: float = 0.01,
        beta: float = 1.0,
        tol: float = 1e-10,
        max_iter: int = 1000,
        ckpt_dir: str | None = None,
        resume: bool = True,
    ) -> DataFrame:
        """Iterate to convergence; returns (vid, katz), L2-normalized
        like networkx. Raises on detected divergence (α ≥ 1/λ_max)."""
        import tempfile

        ckpt = CheckpointManager(
            ckpt_dir or tempfile.mkdtemp(prefix="katz_ckpt_"),
            "katz",
            fingerprint=self._fingerprint(alpha, beta),
        )
        if self.V == 0:
            return self.spark.createDataFrame([], "vid long, katz double")

        start_step = 0
        state = self.vertices.select(
            "vid", F.lit(0.0).alias("x"), F.lit(0.0).alias("dstep")
        )
        if resume:
            last = ckpt.latest_valid_step()
            if last is not None:
                cand = ckpt.read(self.spark, last)
                required = {"vid", "x", "dstep"}
                if set(cand.columns) == required:
                    start_step = last
                    state = cand
                else:
                    import warnings

                    warnings.warn(
                        f"katz: checkpoint at step {last} has columns "
                        f"{sorted(cand.columns)} (expected {sorted(required)}); "
                        "ignoring it and restarting from superstep 0",
                        stacklevel=2,
                    )

        prev_delta = None
        converged = False
        self._grow = 0
        for step in range(start_step, max_iter):
            t0 = time.monotonic()
            msg = self._messages(state.select("vid", "x"))
            prev = state.select("vid", F.col("x").alias("x_prev"))
            xn = F.lit(float(alpha)) * F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(
                float(beta)
            )
            new_state = (
                prev.join(msg.hint("SHUFFLE_HASH"), prev.vid == msg.dst, "left")
                .drop("dst")
                .select(
                    "vid",
                    xn.alias("x"),
                    F.abs(xn - F.col("x_prev")).alias("dstep"),
                )
            )
            from pyspark.sql import Observation

            obs = Observation(f"katz_step_{step + 1}")
            observed = new_state.observe(obs, F.sum("dstep").alias("delta"))
            written = ckpt.write(observed, step + 1)
            delta = float(obs.get["delta"])
            wall_ms = int((time.monotonic() - t0) * 1000)
            self._annotate_manifest(ckpt, step + 1, delta, wall_ms)
            state = written
            if delta < self.V * tol:
                converged = True
                break
            # α ≥ 1/λ_max makes the delta sequence grow geometrically
            # after the β transient; five successive growths is the
            # loud-divergence heuristic (a converging run's delta
            # shrinks by ~αλ_max < 1 every superstep).
            if prev_delta is not None and delta > prev_delta:
                self._grow = getattr(self, "_grow", 0) + 1
                if self._grow >= 5 and step >= 8:
                    raise ValueError(
                        f"katz: L1 delta grew 5 supersteps in a row "
                        f"(now {delta:.3g}) — alpha={alpha} is at or above "
                        "1/lambda_max for this graph; choose a smaller alpha"
                    )
            else:
                self._grow = 0
            prev_delta = delta
        if not converged and start_step < max_iter:
            import warnings

            warnings.warn(
                f"katz: not converged after {max_iter} supersteps "
                f"(last L1 delta {prev_delta}); returning the current iterate",
                stacklevel=2,
            )
        # final L2 normalization (networkx semantics); s=1 when the
        # norm is zero (all-zero fixpoint is only possible at beta=0).
        nrow = state.agg(F.sum(F.col("x") * F.col("x")).alias("n2")).collect()[0]
        n2 = float(nrow["n2"] or 0.0)
        s = 1.0 / (n2**0.5) if n2 > 0 else 1.0
        return state.select("vid", (F.col("x") * F.lit(s)).alias("katz"))

    def _messages(self, x: DataFrame) -> DataFrame:
        """Inbound weighted message sums for one superstep — the
        hot-loop join the plan audit asserts stays SHUFFLE_HASH
        against the persisted src-partitioned edge side (a sort-merge
        here would re-sort |E| every superstep)."""
        return (
            self.e_src.join(x.hint("SHUFFLE_HASH"), self.e_src.src == x.vid)
            .groupBy("dst")
            .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
        )

    @staticmethod
    def _annotate_manifest(
        ckpt: CheckpointManager, step: int, delta: float, wall_ms: int
    ) -> None:
        import json
        import os

        p = ckpt.manifest_path(step)
        with open(p) as fh:
            m = json.load(fh)
        m["metrics"] = {"delta": delta}
        m["wall_ms"] = wall_ms
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.rename(tmp, p)

    def unpersist(self) -> None:
        dfs = [self.vertices, self.e_src]
        if self._own_edges:
            dfs.append(self._edges_in)
        for df in dfs:
            try:
                df.unpersist()
            except Exception:
                pass


def katz_centrality(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.01,
    beta: float = 1.0,
    tol: float = 1e-10,
    max_iter: int = 1000,
    ckpt_dir: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Functional entry point; see :class:`Katz`."""
    k = Katz(spark, edges, num_partitions=num_partitions)
    try:
        return k.run(
            alpha=alpha,
            beta=beta,
            tol=tol,
            max_iter=max_iter,
            ckpt_dir=ckpt_dir,
        )
    finally:
        k.unpersist()
