"""Connected components via hash-min iteration (BASELINE.json
north_rule: "connected components (hash-min iteration)").

Each superstep every vertex broadcasts its current component id (the
minimum vid seen so far) to its neighbors; the new state is the
elementwise min (SURVEY.md §2.4 A3 — ``union + groupBy(min)`` instead
of an outer join: one exchange, no null branches, §4.3). Converges in
O(diameter) supersteps; exact (integer) so results are identical at
any parallelism.

Scale: the symmetrized edge table is shuffled once at setup and
persisted hash-partitioned by ``src``; each superstep shuffles only
the (vid, comp) state (|V| rows) for the join and the min-aggregate.
The changed-count early exit also enables frontier-style semi-join
pruning (not needed at current scales; the full-relation min is
map-side combined).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected simple edge view: both directions, no self-loops,
    distinct."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 50,
    ckpt_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
) -> DataFrame:
    """Returns (vid, comp) with comp = min vid of the component."""
    import tempfile

    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ckpt = CheckpointManager(ckpt_dir or tempfile.mkdtemp(prefix="cc_ckpt_"), "components")

    sym = symmetrize(edges).repartition(P, "src").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = sym.select(F.col("src").alias("vid")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    # (sym carries both directions, so src alone covers every endpoint)

    start = 0
    comps = vertices.select("vid", F.col("vid").alias("comp"))
    if resume:
        last = ckpt.latest_valid_step()
        if last is not None:
            start = last
            comps = ckpt.read(spark, last)

    from pyspark.sql import Observation

    for step in range(start, max_iter):
        t0 = time.monotonic()
        msgs = sym.join(comps, sym.src == comps.vid).select(
            sym.dst.alias("vid"), "comp"
        )
        # carry the old comp as a second min-aggregate: self-messages
        # (the unioned current state) are the only rows with ocomp set,
        # so min(ocomp) IS the old value — no join needed for the
        # changed-count, which observe() folds into the write pass.
        new = (
            comps.select("vid", "comp", F.col("comp").alias("ocomp"))
            .unionByName(msgs.select("vid", "comp", F.lit(None).cast("long").alias("ocomp")))
            .groupBy("vid")
            .agg(F.min("comp").alias("comp"), F.min("ocomp").alias("ocomp"))
        )
        obs = Observation(f"cc_step_{step + 1}")
        observed = new.observe(
            obs,
            F.sum(
                (F.col("comp") != F.coalesce(F.col("ocomp"), F.col("comp"))).cast("long")
            ).alias("changed"),
        ).select("vid", "comp")
        written = ckpt.write(observed, step + 1)
        changed = int(obs.get["changed"] or 0)
        _annotate(ckpt, step + 1, {"changed": changed}, int((time.monotonic() - t0) * 1000))
        comps = written
        if changed == 0:
            break

    sym.unpersist()
    vertices.unpersist()
    return comps


def _annotate(ckpt: CheckpointManager, step: int, metrics: dict, wall_ms: int) -> None:
    import json
    import os

    p = ckpt.manifest_path(step)
    with open(p) as fh:
        m = json.load(fh)
    m["metrics"] = metrics
    m["wall_ms"] = wall_ms
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.rename(tmp, p)
