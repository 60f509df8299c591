"""Connected components via hash-min iteration (BASELINE.json
north_rule: "connected components (hash-min iteration)").

Each superstep every FRONTIER vertex (component id changed last step)
broadcasts its component id to its neighbors; the new state is the
elementwise min over [current state ∪ messages] (SURVEY.md §2.4 A3 —
``union + groupBy(min)`` instead of an outer join: one exchange, no
null branches, §4.3). Converges in O(diameter) supersteps; exact
(integer min) so results are identical at any parallelism.

Frontier-delta (SURVEY.md §2.3 J5): hash-min is monotone — once a
vertex's comp stops changing, re-broadcasting it adds no information —
so messages flow only from vertices whose comp changed in the
previous superstep. After the first few supersteps most of the graph
is converged and per-step message volume collapses from |E| to the
active rim (recorded per-superstep as ``msg_rows`` in the checkpoint
manifests; tests assert the shrink + exact equality vs the full
recompute). ``frontier=False`` restores the dense schedule.

Skew (``salt > 1``): an explicit two-stage min — partial
``groupBy(vid, slt)`` then final ``groupBy(vid)`` — bounds the rows
any single reduce key receives from a mega-hub's message fan-in.
(Spark's map-side partial aggregation already combines per task; the
explicit stage is the documented SURVEY §2.11 ``salted_repartition``
guarantee, independent of hash-table spill heuristics. min is
associative, so results are bit-identical — asserted in tests.)

Scale: the symmetrized edge table is shuffled once at setup and
persisted hash-partitioned by ``src``; each superstep shuffles only
frontier messages plus the (vid, comp) state.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.ckpt import CheckpointManager

STATE_COLS = {"vid", "comp", "chg"}


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected simple edge view: both directions, no self-loops,
    distinct."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()


def _resume_state(ckpt: CheckpointManager, spark: SparkSession, required: set[str]):
    """(state, step) from the newest valid checkpoint whose schema
    matches ``required``; (None, 0) otherwise. An old-format
    checkpoint (pre-frontier, no ``chg`` column) is ignored with a
    warning instead of crashing with an unresolved-column error."""
    last = ckpt.latest_valid_step()
    if last is None:
        return None, 0
    state = ckpt.read(spark, last)
    if set(state.columns) != required:
        import warnings

        warnings.warn(
            f"{ckpt.algo}: checkpoint at step {last} has columns "
            f"{sorted(state.columns)} (expected {sorted(required)}); "
            "ignoring it and restarting from superstep 0",
            stacklevel=3,
        )
        return None, 0
    return state, last


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 50,
    ckpt_dir: str | None = None,
    num_partitions: int | None = None,
    resume: bool = True,
    salt: int = 1,
    frontier: bool = True,
) -> DataFrame:
    """Returns (vid, comp) with comp = min vid of the component."""
    import tempfile

    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    salt = max(1, salt)
    ckpt = CheckpointManager(ckpt_dir or tempfile.mkdtemp(prefix="cc_ckpt_"), "components")

    sym = symmetrize(edges).repartition(P, "src").persist(StorageLevel.MEMORY_AND_DISK)
    vertices = sym.select(F.col("src").alias("vid")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    # (sym carries both directions, so src alone covers every endpoint)

    start = 0
    comps = vertices.select(
        "vid", F.col("vid").alias("comp"), F.lit(True).alias("chg")
    )
    if resume:
        state, start = _resume_state(ckpt, spark, STATE_COLS)
        if state is not None:
            comps = state

    for step in range(start, max_iter):
        t0 = time.monotonic()
        active = comps.filter("chg") if frontier else comps
        msgs = sym.join(active, sym.src == active.vid).select(
            sym.dst.alias("vid"), "comp"
        )
        obs_m = Observation(f"cc_msgs_{step + 1}")
        msgs = msgs.observe(obs_m, F.count("*").alias("msg_rows"))
        if salt > 1:
            # partial min keyed by (vid, salt-of-comp) caps any single
            # reduce key's fan-in; final min restores exactness.
            msgs = (
                msgs.withColumn("_slt", F.pmod(F.xxhash64("comp"), F.lit(salt)))
                .groupBy("vid", "_slt")
                .agg(F.min("comp").alias("comp"))
                .drop("_slt")
            )
        # carry the old comp as a second min-aggregate: self-messages
        # (the unioned current state) are the only rows with ocomp set,
        # so min(ocomp) IS the old value — no join needed for the
        # changed flag, which observe() folds into the write pass.
        new = (
            comps.select("vid", "comp", F.col("comp").alias("ocomp"))
            .unionByName(msgs.select("vid", "comp", F.lit(None).cast("long").alias("ocomp")))
            .groupBy("vid")
            .agg(F.min("comp").alias("comp"), F.min("ocomp").alias("ocomp"))
            .select(
                "vid", "comp", (F.col("comp") != F.col("ocomp")).alias("chg")
            )
        )
        obs = Observation(f"cc_step_{step + 1}")
        observed = new.observe(obs, F.sum(F.col("chg").cast("long")).alias("changed"))
        written = ckpt.write(observed, step + 1)
        changed = int(obs.get["changed"] or 0)
        msg_rows = int(obs_m.get["msg_rows"] or 0)
        _annotate(
            ckpt, step + 1, {"changed": changed, "msg_rows": msg_rows},
            int((time.monotonic() - t0) * 1000),
        )
        comps = written
        if changed == 0:
            break

    sym.unpersist()
    vertices.unpersist()
    return comps.select("vid", "comp")


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
