"""PageRank as an iterative DataFrame program (SURVEY.md §2.11).

Semantics match ``networkx.pagerank`` (verified by tests/test_pagerank.py):
weighted out-edge normalization, damping ``d``, dangling mass
redistributed uniformly, stop when the L1 residual
``Σ|r_k − r_{k−1}|`` < tol.

Two message kernels, identical results:

- ``kernel='sql'``  — pure built-in plan: shuffle-hash join
  ranks⋈edges on ``src`` then map-side-combined ``groupBy(dst).sum``.
  Everything whole-stage-codegen'd; zero Python on the row path.
- ``kernel='csr'``  — the north-star path (BASELINE.json): edges are
  hash-blocked by ``blk = pmod(src, P)`` once; each superstep cogroups
  the rank vector with its edge block and a vectorized pandas/Arrow
  kernel builds a partition-local CSR (sorted src runs → indptr) and
  emits PARTIALLY-REDUCED (dst, contrib) sums via np.bincount, so the
  following JVM groupBy(dst) sees at most |blocks|·|dst| rows.

Skew (mega-threads, BASELINE.json north_rule): ``salt > 1`` splits
each edge block by ``pmod(xxhash64(dst), salt)`` and replicates the
(small) rank side salt-ways, bounding the largest cogroup — the
two-stage salted aggregation of SURVEY.md §2.11. AQE's skew-join
split is the built-in backstop for the 'sql' kernel.

Every superstep checkpoints state + {delta, dangle, wall_ms} through
``CheckpointManager`` (lineage truncation + mid-iteration resume).

Scale notes (100 TB design): per superstep the only wide exchanges
are ranks→blk (|V| rows, the small side) and the partial-msg
groupBy(dst); the edge table is shuffled ONCE at setup and reused
from its persisted hash-partitioned form every superstep. No
driver-side state grows with |V|; the two scalars (delta, dangle)
come back through one 2-column aggregate per superstep.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager


def _vertices_from_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )


def _csr_kernel(key, edf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
    """Per-block CSR message kernel (vectorized, partial-combining).

    edf: (src, dst, w_norm[, salt]) — the edge block; rdf: (vid, rank).
    Builds rank lookup via searchsorted on the sorted vid vector, then
    reduces contributions by dst with np.bincount before returning.
    """
    import numpy as np

    if len(edf) == 0 or len(rdf) == 0:
        return pd.DataFrame({"dst": pd.Series(dtype="int64"), "contrib": pd.Series(dtype="float64")})
    vids = rdf["vid"].to_numpy()
    ranks = rdf["rank"].to_numpy()
    order = np.argsort(vids, kind="stable")
    vids_s, ranks_s = vids[order], ranks[order]

    src = edf["src"].to_numpy()
    pos = np.searchsorted(vids_s, src)
    # guard: srcs must exist in the co-grouped rank block
    pos = np.clip(pos, 0, len(vids_s) - 1)
    hit = vids_s[pos] == src
    contrib = ranks_s[pos] * edf["w_norm"].to_numpy()
    contrib[~hit] = 0.0

    dst = edf["dst"].to_numpy()
    uniq, inv = np.unique(dst, return_inverse=True)
    sums = np.bincount(inv, weights=contrib, minlength=len(uniq))
    return pd.DataFrame({"dst": uniq.astype("int64"), "contrib": sums})


class PageRank:
    """Prepared PageRank over an aggregated edge table.

    Usage::

        pr = PageRank(spark, edges_agg, num_partitions=64, salt=1)
        ranks = pr.run(d=0.85, tol=1e-6, ckpt_dir='/tmp/ckpt')
    """

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        num_partitions: int | None = None,
        salt: int = 1,
        kernel: str = "csr",
    ):
        if kernel not in ("csr", "sql"):
            raise ValueError(f"unknown kernel {kernel!r}")
        self.spark = spark
        self.kernel = kernel
        self.P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        self.salt = max(1, salt)

        self.vertices = _vertices_from_edges(edges).persist(StorageLevel.MEMORY_AND_DISK)
        self.V = self.vertices.count()

        out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
        enorm = (
            edges.join(out_w, "src")
            .select("src", "dst", (F.col("w") / F.col("out_w")).alias("w_norm"))
            .withColumn("blk", F.pmod(F.col("src"), F.lit(self.P)))
        )
        if self.salt > 1:
            enorm = enorm.withColumn(
                "slt", F.pmod(F.xxhash64("dst"), F.lit(self.salt)).cast("int")
            )
        # ONE setup shuffle; every superstep reuses this partitioning.
        keys = ["blk", "slt"] if self.salt > 1 else ["blk"]
        self.enorm = enorm.repartition(self.P, *keys).persist(StorageLevel.MEMORY_AND_DISK)
        self.enorm.count()
        self.E = edges.count()

        # dangling = vertices with no out-edges (receive-only)
        self.dangling = (
            self.vertices.join(edges.select("src").distinct(), F.col("vid") == F.col("src"), "left_anti")
            .select("vid", F.lit(True).alias("is_dangling"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self.D = self.dangling.count()

    # ---- one superstep ----------------------------------------------
    def _messages(self, ranks: DataFrame) -> DataFrame:
        if self.kernel == "sql":
            return (
                self.enorm.join(
                    ranks.hint("SHUFFLE_HASH"), self.enorm.src == ranks.vid
                )
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w_norm")).alias("contrib"))
            )
        rblk = ranks.withColumn("blk", F.pmod(F.col("vid"), F.lit(self.P)))
        if self.salt > 1:
            rblk = rblk.withColumn(
                "slt", F.explode(F.array([F.lit(i) for i in range(self.salt)]))
            )
            grouped_e = self.enorm.groupBy("blk", "slt")
            grouped_r = rblk.groupBy("blk", "slt")
        else:
            grouped_e = self.enorm.groupBy("blk")
            grouped_r = rblk.groupBy("blk")
        partial = grouped_e.cogroup(grouped_r).applyInPandas(
            _csr_kernel, "dst long, contrib double"
        )
        return partial.groupBy("dst").agg(F.sum("contrib").alias("contrib"))

    def run(
        self,
        d: float = 0.85,
        tol: float = 1e-6,
        max_iter: int = 200,
        ckpt_dir: str | None = None,
        resume: bool = True,
    ) -> DataFrame:
        """Iterate to L1 convergence; returns (vid, rank).

        With ``ckpt_dir`` every superstep persists state+manifest and a
        killed run resumes from the last valid superstep.
        """
        import tempfile

        ckpt = CheckpointManager(ckpt_dir or tempfile.mkdtemp(prefix="pr_ckpt_"), "pagerank")
        V, D = self.V, self.D
        if V == 0:
            return self.spark.createDataFrame([], "vid long, rank double")

        start_step = 0
        dangle = D / V  # analytic at uniform init
        if resume:
            last = ckpt.latest_valid_step()
            if last is not None:
                start_step = last
                ranks = ckpt.read(self.spark, last)
                dangle = (
                    ranks.join(self.dangling, "vid", "left_semi")
                    .agg(F.sum("rank"))
                    .collect()[0][0]
                    or 0.0
                )
            else:
                ranks = self.vertices.select("vid", F.lit(1.0 / V).alias("rank"))
        else:
            ranks = self.vertices.select("vid", F.lit(1.0 / V).alias("rank"))

        for step in range(start_step, max_iter):
            t0 = time.monotonic()
            msgs = self._messages(ranks)
            base = (1.0 - d) / V + d * dangle / V
            new_ranks = self.vertices.join(
                msgs, self.vertices.vid == msgs.dst, "left"
            ).select(
                "vid",
                (F.lit(base) + F.lit(d) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
            # materialize state FIRST (barrier + resume point), then
            # compute the two scalars in ONE aggregate over the read-back:
            # L1 residual + next superstep's dangling mass.
            old = ranks.select(F.col("vid").alias("ovid"), F.col("rank").alias("orank"))
            written = ckpt.write(new_ranks, step + 1)
            row = (
                written.join(old, written.vid == F.col("ovid"))
                .join(self.dangling, "vid", "left")
                .agg(
                    F.sum(F.abs(F.col("rank") - F.col("orank"))).alias("delta"),
                    F.sum(
                        F.when(F.col("is_dangling"), F.col("rank")).otherwise(0.0)
                    ).alias("dangle"),
                )
                .collect()[0]
            )
            delta, dangle = float(row["delta"]), float(row["dangle"] or 0.0)
            wall_ms = int((time.monotonic() - t0) * 1000)
            # re-stamp the manifest with this superstep's delta metrics
            self._annotate_manifest(ckpt, step + 1, delta, dangle, wall_ms)
            ranks = written
            if delta < tol:
                break
        return ranks

    @staticmethod
    def _annotate_manifest(ckpt: CheckpointManager, step: int, delta: float, dangle: float, wall_ms: int) -> None:
        import json
        import os

        p = ckpt.manifest_path(step)
        with open(p) as fh:
            m = json.load(fh)
        m["metrics"] = {"delta": delta, "dangle": dangle}
        m["wall_ms"] = wall_ms
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(m, fh)
        os.rename(tmp, p)

    def unpersist(self) -> None:
        for df in (self.vertices, self.enorm, self.dangling):
            try:
                df.unpersist()
            except Exception:
                pass


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    ckpt_dir: str | None = None,
    num_partitions: int | None = None,
    salt: int = 1,
    kernel: str = "csr",
) -> DataFrame:
    """Functional entry point; see :class:`PageRank`."""
    pr = PageRank(spark, edges, num_partitions=num_partitions, salt=salt, kernel=kernel)
    try:
        return pr.run(d=d, tol=tol, max_iter=max_iter, ckpt_dir=ckpt_dir)
    finally:
        pr.unpersist()
