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

from ..plans.ckpt import CheckpointManager, mix_fingerprint


def _vertices_from_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )


def _csr_block(src, dst, w_norm, vids, ranks):
    """Shared NumPy core of the CSR message kernel: rank lookup by
    searchsorted on the sorted vid vector, then per-dst partial
    reduction with np.bincount. Returns (uniq_dst, sums)."""
    import numpy as np

    order = np.argsort(vids, kind="stable")
    vids_s, ranks_s = vids[order], ranks[order]
    pos = np.searchsorted(vids_s, src)
    # guard: srcs must exist in the co-grouped rank block
    pos = np.clip(pos, 0, len(vids_s) - 1)
    hit = vids_s[pos] == src
    contrib = ranks_s[pos] * w_norm
    contrib[~hit] = 0.0
    uniq, inv = np.unique(dst, return_inverse=True)
    sums = np.bincount(inv, weights=contrib, minlength=len(uniq))
    return uniq.astype("int64"), sums


def _csr_kernel(key, edf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
    """Per-block CSR message kernel (pandas cogroup flavor) — the
    ``kernel='csr_pandas'`` fallback path (applyInPandas instead of
    applyInArrow; same ``_csr_block`` math, so results are identical —
    asserted by the kernel-parity test). Use when an environment's
    Arrow cogroup path is unavailable; the Arrow flavor avoids the
    pandas conversion and is the default."""
    if len(edf) == 0 or len(rdf) == 0:
        return pd.DataFrame({"dst": pd.Series(dtype="int64"), "contrib": pd.Series(dtype="float64")})
    uniq, sums = _csr_block(
        edf["src"].to_numpy(),
        edf["dst"].to_numpy(),
        edf["w_norm"].to_numpy(),
        rdf["vid"].to_numpy(),
        rdf["rank"].to_numpy(),
    )
    return pd.DataFrame({"dst": uniq, "contrib": sums})


def _csr_kernel_arrow(key, etab, rtab):
    """Per-block CSR message kernel (Arrow cogroup flavor): zero-copy
    Arrow→NumPy views, no pandas conversion on either side."""
    import pyarrow as pa

    if etab.num_rows == 0 or rtab.num_rows == 0:
        return pa.table(
            {"dst": pa.array([], type=pa.int64()), "contrib": pa.array([], type=pa.float64())}
        )
    uniq, sums = _csr_block(
        etab.column("src").to_numpy(zero_copy_only=False),
        etab.column("dst").to_numpy(zero_copy_only=False),
        etab.column("w_norm").to_numpy(zero_copy_only=False),
        rtab.column("vid").to_numpy(zero_copy_only=False),
        rtab.column("rank").to_numpy(zero_copy_only=False),
    )
    return pa.table({"dst": pa.array(uniq), "contrib": pa.array(sums)})


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
        personalization: DataFrame | None = None,
    ):
        """``personalization``: optional (vid, p) teleport weights —
        personalized PageRank with networkx ``_pagerank_scipy``
        semantics: p is L1-normalized, vids absent from it get weight
        0, and dangling mass is redistributed by the SAME vector
        (``dangling=None`` default). The update becomes
        ``r' = (1-d)·p + d·(Aᵀr + dangle·p)`` — per-vertex teleport is
        a column carried in the superstep state, so the iteration
        plan is unchanged (no extra join; the scalar base folds into
        a pw-weighted column)."""
        if kernel not in ("csr", "sql", "csr_pandas"):
            raise ValueError(f"unknown kernel {kernel!r}")
        self.spark = spark
        self.kernel = kernel
        self.P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
        self.salt = max(1, salt)

        # Materialize the input ONCE: setup derives vertices, degrees,
        # dangling flags, and the blocked edge table from it — without
        # this an unpersisted input lineage (e.g. the full transcript
        # extraction) is recomputed ~6x (measured 338s -> 60s setup at
        # the scale tier).
        self._own_edges = not (
            edges.storageLevel.useMemory or edges.storageLevel.useDisk
        )
        edges = edges.persist(StorageLevel.MEMORY_AND_DISK) if self._own_edges else edges
        self._edges_in = edges

        # state skeleton: every vertex + its dangling flag (no out-edges)
        # — carried through every superstep so the per-step delta and
        # next dangling mass come from ONE aggregate over the
        # checkpoint read-back instead of extra joins.
        srcs = edges.select(F.col("src").alias("vid")).distinct()
        verts = (
            _vertices_from_edges(edges)
            .join(srcs.withColumn("_has_out", F.lit(True)), "vid", "left")
            .select("vid", F.coalesce(F.col("_has_out"), F.lit(False)).alias("has_out"))
        )
        self.personalized = personalization is not None
        if self.personalized:
            pvec = personalization.select(
                "vid", F.col("p").cast("double").alias("_p_raw")
            )
            # un-normalized teleport weight rides the vertex skeleton;
            # its sum folds into the one setup aggregate below, so
            # normalization costs no extra job.
            verts = verts.join(pvec, "vid", "left").withColumn(
                "_p_raw", F.coalesce(F.col("_p_raw"), F.lit(0.0))
            )
        self.vertices = verts.persist(StorageLevel.MEMORY_AND_DISK)
        aggs = [
            F.count("*").alias("v"),
            F.sum(F.when(~F.col("has_out"), 1).otherwise(0)).alias("d"),
        ]
        if self.personalized:
            aggs.append(F.sum("_p_raw").alias("psum"))
            # teleport-vector hash: folded into the SAME setup aggregate
            # (no extra job) and mixed into the checkpoint fingerprint
            # below — a PPR fixpoint is a function of (graph, teleport
            # vector), so resuming a ckpt_dir written with a different
            # vector must be rejected, not silently converged to the OLD
            # vector's fixpoint (round-3 ADVICE).
            aggs.append(
                F.coalesce(F.bit_xor(F.xxhash64("vid", "_p_raw")), F.lit(0)).alias("ph")
            )
        counts = self.vertices.agg(*aggs).collect()[0]
        self.V, self.D = int(counts["v"]), int(counts["d"] or 0)
        self._pfp = 0
        if self.personalized:
            self.psum = float(counts["psum"] or 0.0)
            if self.psum <= 0:
                raise ValueError(
                    "personalization weights sum to zero over the graph's vertices"
                )
            self._pfp = int(counts["ph"])

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
        # The partition key must match what the superstep consumes or
        # the 26M-row edge side reshuffles every iteration: the sql
        # kernel joins on src (hashpartitioning(src)), the csr kernel
        # cogroups on blk(+slt).
        if self.kernel == "sql":
            keys = ["src"]
        else:
            keys = ["blk", "slt"] if self.salt > 1 else ["blk"]
        self.enorm = enorm.repartition(self.P, *keys).persist(StorageLevel.MEMORY_AND_DISK)
        # E and the graph fingerprint come from the SAME warm-up
        # aggregate (no extra job); the fingerprint is stamped into
        # every checkpoint manifest so resume rejects state written for
        # a different edge set (round-2 ADVICE).
        erow = self.enorm.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst", "w_norm")), F.lit(0)).alias("h"),
        ).collect()[0]
        self.E = int(erow["n"])
        # identity = edge set ⊕ (personalization vector, when set)
        self.fingerprint = mix_fingerprint(self.E, int(erow["h"]) ^ self._pfp)

    # ---- one superstep ----------------------------------------------
    def _messages(self, state: DataFrame) -> DataFrame:
        ranks = state.select("vid", "rank")
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
        cg = grouped_e.cogroup(grouped_r)
        if self.kernel == "csr_pandas":
            partial = cg.applyInPandas(_csr_kernel, "dst long, contrib double")
        else:
            partial = cg.applyInArrow(_csr_kernel_arrow, "dst long, contrib double")
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

        ckpt = CheckpointManager(
            ckpt_dir or tempfile.mkdtemp(prefix="pr_ckpt_"),
            "pagerank",
            fingerprint=self.fingerprint,
        )
        V, D = self.V, self.D
        if V == 0:
            return self.spark.createDataFrame([], "vid long, rank double")

        start_step = 0
        dangle = D / V  # analytic at uniform init
        init_cols = [
            F.col("vid"),
            F.lit(1.0 / V).alias("rank"),
            F.col("has_out"),
            F.lit(0.0).alias("dstep"),
        ]
        if self.personalized:
            init_cols.append((F.col("_p_raw") / F.lit(self.psum)).alias("pw"))
        init = self.vertices.select(*init_cols)
        state = init
        if resume:
            last = ckpt.latest_valid_step()
            if last is not None:
                cand = ckpt.read(self.spark, last)
                # schema compatibility gate: a checkpoint written by an
                # older state layout (e.g. bare (vid, rank)) is ignored
                # with a warning — resuming it would crash with an
                # unresolved-column error mid-superstep (round-1 ADVICE).
                # personalized runs carry pw, so a uniform run also
                # refuses a personalized checkpoint and vice versa.
                required = {"vid", "rank", "has_out", "dstep"} | (
                    {"pw"} if self.personalized else set()
                )
                if set(cand.columns) == required:
                    start_step = last
                    state = cand
                    dangle = (
                        cand.agg(
                            F.sum(F.when(~F.col("has_out"), F.col("rank")).otherwise(0.0))
                        ).collect()[0][0]
                        or 0.0
                    )
                else:
                    import warnings

                    warnings.warn(
                        f"pagerank: checkpoint at step {last} has columns "
                        f"{sorted(cand.columns)} (expected {sorted(required)}); "
                        "ignoring it and restarting from superstep 0",
                        stacklevel=2,
                    )

        for step in range(start_step, max_iter):
            t0 = time.monotonic()
            msgs = self._messages(state)
            # state ⋈ msgs carries old rank + dangling flag through, so
            # the per-step L1 delta is a COLUMN of the new state (free
            # lineage metric in the checkpoint) and the two scalars come
            # from one aggregate over the materialized read-back.
            if self.personalized:
                # r' = (1-d)·pw + d·(contrib + dangle·pw)
                new_rank = F.lit((1.0 - d) + d * dangle) * F.col("pw") + F.lit(
                    d
                ) * F.coalesce(F.col("contrib"), F.lit(0.0))
            else:
                base = (1.0 - d) / V + d * dangle / V
                new_rank = F.lit(base) + F.lit(d) * F.coalesce(
                    F.col("contrib"), F.lit(0.0)
                )
            out_cols = [
                F.col("vid"),
                new_rank.alias("rank"),
                F.col("has_out"),
                F.abs(new_rank - F.col("rank")).alias("dstep"),
            ]
            if self.personalized:
                out_cols.append(F.col("pw"))
            new_state = state.join(
                msgs.hint("SHUFFLE_HASH"), state.vid == msgs.dst, "left"
            ).select(*out_cols)
            # observe() computes the two scalars DURING the checkpoint
            # write pass — no second job, no read-back scan.
            from pyspark.sql import Observation

            obs = Observation(f"pr_step_{step + 1}")
            observed = new_state.observe(
                obs,
                F.sum("dstep").alias("delta"),
                F.sum(
                    F.when(~F.col("has_out"), F.col("rank")).otherwise(0.0)
                ).alias("dangle"),
            )
            written = ckpt.write(observed, step + 1)
            row = obs.get
            delta, dangle = float(row["delta"]), float(row["dangle"] or 0.0)
            wall_ms = int((time.monotonic() - t0) * 1000)
            # re-stamp the manifest with this superstep's delta metrics
            self._annotate_manifest(ckpt, step + 1, delta, dangle, wall_ms)
            state = written
            if delta < tol:
                break
        return state.select("vid", "rank")

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
        dfs = [self.vertices, self.enorm]
        if self._own_edges:
            dfs.append(self._edges_in)
        for df in dfs:
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
    personalization: DataFrame | None = None,
) -> DataFrame:
    """Functional entry point; see :class:`PageRank`."""
    pr = PageRank(
        spark,
        edges,
        num_partitions=num_partitions,
        salt=salt,
        kernel=kernel,
        personalization=personalization,
    )
    try:
        return pr.run(d=d, tol=tol, max_iter=max_iter, ckpt_dir=ckpt_dir)
    finally:
        pr.unpersist()
