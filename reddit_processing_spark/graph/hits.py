"""HITS (Kleinberg hubs & authorities) as an iterative DataFrame
program (SURVEY.md §2.11).

Power iteration on the weighted adjacency A: per superstep
``a ← Aᵀh`` then ``h ← Aa``, both L1-normalized; stop when the L1
change of the normalized hub vector < tol. The fixpoint is the
principal left/right singular-vector pair — what networkx's
scipy-ARPACK ``hits()`` converges to (scipy is absent in this
sandbox, so parity is tested against the pure-numpy power-iteration
oracle ``oracle/hits.py``, which implements the identical textbook
iteration).

Scale shape (100 TB design): the edge table is shuffled TWICE at
setup — once hash-partitioned by ``src`` (consumed by the a-step
join) and once by ``dst`` (consumed by the h-step join) — and both
persisted copies are reused every superstep, so each superstep's wide
exchanges are only the two |V|-row state shuffles into the joins
(SHUFFLE_HASH-hinted: the persisted edge sides never re-shuffle) and
the two message groupBys. Unlike PageRank's single scalar pair, HITS
needs the two normalization sums *mid-superstep* (the delta column is
a function of h_raw/Σh_raw), so each superstep runs one |V|-row
aggregate job over the persisted raw state before the checkpoint
write — a second job per superstep whose input never grows with |E|.

No driver-side state grows with |V| or |E|; checkpoints truncate
lineage and stamp the graph fingerprint so resume rejects state from
a different edge set (same guard as PageRank/CC)."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager, mix_fingerprint
from .partitioning import resolve_partitions
from .pagerank import _vertices_from_edges


class HITS:
    """Prepared HITS over an aggregated (src, dst, w) edge table."""

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
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK) if self._own_edges else edges
        self._edges_in = edges
        # after the persist, so the sizing count warms the cache
        # instead of recomputing unpersisted lineage twice
        self.P = resolve_partitions(spark, edges, num_partitions)

        self.vertices = _vertices_from_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
        # two persisted copies, each partitioned by the key its
        # superstep join consumes — state sides shuffle, edges never do.
        e = edges.select("src", "dst", F.col("w").cast("double").alias("w"))
        self.e_src = e.repartition(self.P, "src").persist(StorageLevel.MEMORY_AND_DISK)
        self.e_dst = e.repartition(self.P, "dst").persist(StorageLevel.MEMORY_AND_DISK)

        vrow = self.vertices.agg(F.count("*").alias("v")).collect()[0]
        self.V = int(vrow["v"])
        erow = self.e_src.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst", "w")), F.lit(0)).alias("h"),
        ).collect()[0]
        self.E = int(erow["n"])
        self.fingerprint = mix_fingerprint(self.E, erow["h"])

    def run(
        self,
        tol: float = 1e-8,
        max_iter: int = 100,
        ckpt_dir: str | None = None,
        resume: bool = True,
    ) -> DataFrame:
        """Iterate to convergence; returns (vid, hub, auth), each
        column L1-normalized to sum 1."""
        import tempfile

        ckpt = CheckpointManager(
            ckpt_dir or tempfile.mkdtemp(prefix="hits_ckpt_"),
            "hits",
            fingerprint=self.fingerprint,
        )
        if self.V == 0:
            return self.spark.createDataFrame([], "vid long, hub double, auth double")

        start_step = 0
        state = self.vertices.select(
            "vid",
            F.lit(1.0 / self.V).alias("hub"),
            F.lit(0.0).alias("auth"),
            F.lit(0.0).alias("dstep"),
        )
        if resume:
            last = ckpt.latest_valid_step()
            if last is not None:
                cand = ckpt.read(self.spark, last)
                required = {"vid", "hub", "auth", "dstep"}
                if set(cand.columns) == required:
                    start_step = last
                    state = cand
                else:
                    import warnings

                    warnings.warn(
                        f"hits: checkpoint at step {last} has columns "
                        f"{sorted(cand.columns)} (expected {sorted(required)}); "
                        "ignoring it and restarting from superstep 0",
                        stacklevel=2,
                    )

        for step in range(start_step, max_iter):
            t0 = time.monotonic()
            h = state.select("vid", "hub")
            # a ← Aᵀh : edges(src-partitioned) ⋈ h on src, sum by dst.
            # The grouped key is renamed (dst → avid) so the next join
            # against e_dst.dst is between DISTINCT attributes — both
            # frames descend from the same edge scan, and a bare
            # dst == dst would be a trivially-true self-join predicate.
            a_raw = (
                self.e_src.join(h.hint("SHUFFLE_HASH"), self.e_src.src == h.vid)
                .groupBy("dst")
                .agg(F.sum(F.col("hub") * F.col("w")).alias("a_raw"))
                .withColumnRenamed("dst", "avid")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            # h ← Aa : edges(dst-partitioned) ⋈ a on dst, sum by src
            h_raw = (
                self.e_dst.join(
                    a_raw.hint("SHUFFLE_HASH"), self.e_dst.dst == a_raw.avid
                )
                .groupBy("src")
                .agg(F.sum(F.col("a_raw") * F.col("w")).alias("h_raw"))
            )
            prev = state.select("vid", F.col("hub").alias("hub_prev"))
            raw = (
                prev.join(h_raw.hint("SHUFFLE_HASH"), prev.vid == h_raw.src, "left")
                .drop("src")
                .join(
                    a_raw.hint("SHUFFLE_HASH"),
                    F.col("vid") == a_raw.avid,
                    "left",
                )
                .select(
                    "vid",
                    "hub_prev",
                    F.coalesce(F.col("h_raw"), F.lit(0.0)).alias("h_raw"),
                    F.coalesce(F.col("a_raw"), F.lit(0.0)).alias("a_raw"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            sums = raw.agg(
                F.sum("h_raw").alias("sh"), F.sum("a_raw").alias("sa")
            ).collect()[0]
            sh, sa = float(sums["sh"] or 0.0), float(sums["sa"] or 0.0)
            if sh <= 0 or sa <= 0:
                # no mass flows (edge-less graph slipped through) —
                # degenerate; report zeros rather than divide by zero.
                raw.unpersist()
                a_raw.unpersist()
                return state.select(
                    "vid", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
                )
            hub_n = F.col("h_raw") / F.lit(sh)
            new_state = raw.select(
                "vid",
                hub_n.alias("hub"),
                (F.col("a_raw") / F.lit(sa)).alias("auth"),
                F.abs(hub_n - F.col("hub_prev")).alias("dstep"),
            )
            from pyspark.sql import Observation

            obs = Observation(f"hits_step_{step + 1}")
            observed = new_state.observe(obs, F.sum("dstep").alias("delta"))
            written = ckpt.write(observed, step + 1)
            delta = float(obs.get["delta"])
            wall_ms = int((time.monotonic() - t0) * 1000)
            self._annotate_manifest(ckpt, step + 1, delta, wall_ms)
            a_raw.unpersist()
            raw.unpersist()
            state = written
            if delta < tol:
                break
        return state.select("vid", "hub", "auth")

    @staticmethod
    def _annotate_manifest(ckpt: CheckpointManager, step: int, delta: float, wall_ms: int) -> None:
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
        dfs = [self.vertices, self.e_src, self.e_dst]
        if self._own_edges:
            dfs.append(self._edges_in)
        for df in dfs:
            try:
                df.unpersist()
            except Exception:
                pass


def hits(
    spark: SparkSession,
    edges: DataFrame,
    tol: float = 1e-8,
    max_iter: int = 100,
    ckpt_dir: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Functional entry point; see :class:`HITS`."""
    h = HITS(spark, edges, num_partitions=num_partitions)
    try:
        return h.run(tol=tol, max_iter=max_iter, ckpt_dir=ckpt_dir)
    finally:
        h.unpersist()
