"""Transcripts → edge-table extraction (SURVEY.md §2.11 ``derive_edges``).

The reference pipeline's merge phase walks each thread chronologically
and emits per-entity consolidated records; the north star re-frames
that walk as edge derivation over conversation transcripts
(BASELINE.json north_star): for every conversation, ordered by the
*stable turn ordering* (turn_idx, ts):

- **role edges** (kind='role'): one directed edge per adjacent turn
  pair, role(t-1) → role(t), weight 1.
- **reply edges** (kind='reply'): for every 'user' turn, an edge pair
  user ↔ thread (both directions), weight 1 — the user↔thread reply
  bipartite structure.

Invariants (BASELINE.json input_hint):
- per-turn text byte-equality: ``extract_turns`` carries ``text``
  through untouched; parity-tested against the pandas oracle.
- stable turn ordering: dedup keeps the FIRST record per
  (conv_id, turn_idx) by (ts, text) — a total, deterministic order.
- no per-row Python: everything below is built-in Column expressions
  (whole-stage-codegen'd); vertex ids are ``xxhash64`` (deterministic,
  partition-layout-independent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.fixtures import U_A, U_B

ROLE = "role"
REPLY = "reply"


def vid_expr(vtype: str | Column, vkey: Column) -> Column:
    """Deterministic 64-bit vertex id: xxhash64(vtype, vkey).

    Never ``monotonically_increasing_id`` — that is partition-layout-
    dependent and would break resume + cross-parallelism equality
    (SURVEY.md §4.2.6).
    """
    t = F.lit(vtype) if isinstance(vtype, str) else vtype
    return F.xxhash64(t, vkey)


def synthetic_user_key(n_users: int) -> Column:
    """Author-resolution rule for the synthetic transcripts fixture.

    The six-column input carries no user column (FIXTURES.md §A.1); the
    fixture's per-turn user identity is the shared arithmetic rule
    u{pmod(conv*U_A + turn*U_B, n_users)}, recomputed identically here
    (Spark built-ins) and in oracle/extract.py (pandas).
    """
    conv_num = F.substring("conv_id", 2, 8).cast("long")
    uid = F.pmod(conv_num * F.lit(U_A) + F.col("turn_idx").cast("long") * F.lit(U_B), F.lit(n_users))
    return F.concat(F.lit("u"), uid.cast("string"))


def extract_turns(transcripts: DataFrame) -> DataFrame:
    """Deduped, stably-ordered turns (text passes through byte-exact).

    Keep-first semantics: one row per (conv_id, turn_idx), the winner
    being the smallest (ts, text) — a total order, so the result is
    independent of physical row order and parallelism.
    """
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").asc_nulls_last(), F.col("text").asc_nulls_last()
    )
    return (
        transcripts.filter(
            F.col("conv_id").isNotNull()
            & F.col("turn_idx").isNotNull()
            & F.col("role").isNotNull()
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def derive_edges(
    transcripts: DataFrame,
    user_key: Column | None = None,
    n_users: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Derive (edges, vertices) from a transcripts table.

    Returns
    -------
    edges    : src:long, dst:long, kind:string, conv_id:string, w:double
    vertices : vid:long, vkey:string, vtype:string

    ``user_key`` resolves a per-turn author key for 'user' turns; when
    omitted the synthetic-fixture rule is used with ``n_users`` derived
    from the data (n_distinct_convs // 3) exactly as the oracle does.
    """
    turns = extract_turns(transcripts)

    if user_key is None:
        if n_users is None:
            n_convs = turns.select("conv_id").distinct().count()
            n_users = max(1, n_convs // 3)
        user_key = synthetic_user_key(n_users)

    ordering = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    with_prev = turns.withColumn("_prev_role", F.lag("role", 1).over(ordering))

    role_edges = (
        with_prev.filter(F.col("_prev_role").isNotNull())
        .select(
            vid_expr(ROLE, F.col("_prev_role")).alias("src"),
            vid_expr(ROLE, F.col("role")).alias("dst"),
            F.lit(ROLE).alias("kind"),
            F.col("conv_id"),
            F.lit(1.0).alias("w"),
        )
    )

    user_turns = turns.filter(F.col("role") == "user").select(
        "conv_id", vid_expr("user", user_key).alias("uvid"), vid_expr("thread", F.col("conv_id")).alias("tvid")
    )
    reply_edges = user_turns.select(
        F.col("uvid").alias("src"),
        F.col("tvid").alias("dst"),
        F.lit(REPLY).alias("kind"),
        "conv_id",
        F.lit(1.0).alias("w"),
    ).unionByName(
        user_turns.select(
            F.col("tvid").alias("src"),
            F.col("uvid").alias("dst"),
            F.lit(REPLY).alias("kind"),
            "conv_id",
            F.lit(1.0).alias("w"),
        )
    )

    edges = role_edges.unionByName(reply_edges)

    role_vertices = (
        turns.select(F.col("role").alias("vkey")).distinct()
        .select(vid_expr(ROLE, F.col("vkey")).alias("vid"), "vkey", F.lit(ROLE).alias("vtype"))
    )
    user_vertices = (
        turns.filter(F.col("role") == "user")
        .select(user_key.alias("vkey")).distinct()
        .select(vid_expr("user", F.col("vkey")).alias("vid"), "vkey", F.lit("user").alias("vtype"))
    )
    thread_vertices = (
        turns.filter(F.col("role") == "user")
        .select(F.col("conv_id").alias("vkey")).distinct()
        .select(vid_expr("thread", F.col("vkey")).alias("vid"), "vkey", F.lit("thread").alias("vtype"))
    )
    vertices = role_vertices.unionByName(user_vertices).unionByName(thread_vertices)
    return edges, vertices


def aggregate_edges(edges: DataFrame) -> DataFrame:
    """Collapse the per-occurrence multigraph to weighted simple edges.

    The graph algorithms consume this (networkx parity aggregates the
    same way: parallel edges sum their weights).
    """
    return edges.groupBy("src", "dst").agg(F.sum("w").alias("w"))
