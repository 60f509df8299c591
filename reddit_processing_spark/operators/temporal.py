"""Temporal joins (SURVEY.md §2.3 J8): as-of and range joins.

The reference has no temporal operator; these fill the training-data
pipeline surface (event alignment, feature as-of lookup) Spark lacks
natively.

``asof_join`` uses the union + window ``last(ignorenulls)`` pattern:
one shuffle on the join key, no per-row Python, no broadcast of the
(potentially huge) right side — the classic scalable as-of shape.
A sort-merge BNLJ range join would be O(|L|·|R|) per key; this is
O((|L|+|R|) log) per key via the window sort and survives hot keys the
same way any window does (single shuffle partition per key — salt the
key upstream if one entity owns billions of rows).

Determinism contract: the right side must be unique per
``(on, right_ts)`` — pre-aggregate it (e.g. keep max id per key+ts)
or results at tied timestamps are partition-order-dependent.

Null semantics (matches pandas ``merge_asof`` / SQL ASOF JOIN): all
``value_cols`` are taken from the SINGLE most recent matching right
row — a genuinely NULL value in that row stays NULL (the values ride
in one struct through ``last(ignorenulls)``; the struct itself is
only null for the union'd left rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the most recent
    right row with ``right_ts <= left_ts`` (backward as-of; strict
    ``<`` when ``inclusive=False``) sharing the join key ``on``.

    Returns all left columns plus ``value_cols`` (null when no right
    row precedes the left row).
    """
    left_cols = left.columns
    conflicts = sorted(set(value_cols) & set(left_cols))
    if conflicts:
        raise ValueError(
            f"asof_join: value_cols {conflicts} collide with left columns — "
            "rename one side before joining"
        )
    # collision-proof generated internal names (a left column named
    # _k/_ts/_side used to break the union — round-1 ADVICE)
    taken = set(left_cols) | set(right.columns) | set(value_cols)

    def _gen(base: str) -> str:
        name = base
        while name in taken:
            name += "_"
        taken.add(name)
        return name

    kc, tc, sc, pc = _gen("_k"), _gen("_ts"), _gen("_side"), _gen("_pay")

    # ALL value columns travel inside ONE struct, so every attached
    # value comes from the SINGLE most recent right row — including
    # its genuine NULLs. (Per-column last(ignorenulls) would skip a
    # null value and backfill it from an OLDER row, and different
    # columns could come from different rows — round-1 ADVICE.)
    r2 = right.select(
        F.col(on).alias(kc),
        F.col(right_ts).alias(tc),
        # _side orders right rows before (inclusive) or after
        # (exclusive) left rows at equal timestamps, realizing the
        # boundary semantics inside one total window order.
        F.lit(0 if inclusive else 2).alias(sc),
        F.struct(*[F.col(c) for c in value_cols]).alias(pc),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    pay_type = r2.schema[pc].dataType
    l2 = left.select(
        F.col(on).alias(kc),
        F.col(left_ts).alias(tc),
        F.lit(1).alias(sc),
        F.lit(None).cast(pay_type).alias(pc),
        *[F.col(c) for c in left_cols],
    )
    w = (
        Window.partitionBy(kc)
        .orderBy(tc, sc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l2.unionByName(r2).select(
        sc,
        *[F.col(c) for c in left_cols],
        F.last(pc, ignorenulls=True).over(w).alias(pc),
    )
    return filled.filter(F.col(sc) == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"{pc}.{c}").alias(c) for c in value_cols],
    )


def range_join_buckets(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "left",
) -> DataFrame:
    """Non-equi range join: fact rows matched to the bucket whose
    ``[lo, hi]`` interval contains ``value_col``.

    Join semantics are EXPLICIT (round-2 ADVICE closed): ``how='left'``
    (default) keeps facts that land in no bucket, with NULL bucket
    columns — callers bucketing a measure must decide what an
    out-of-range fact means, not have it silently vanish;
    ``how='inner'`` drops them.

    The bucket table is small by construction (it defines a banding),
    so it is BROADCAST — the non-equi predicate then evaluates as a
    broadcast nested-loop join with no shuffle of the fact side, the
    only scalable plan for an interval predicate in Spark.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"range_join_buckets: how must be 'left' or 'inner', got {how!r}")
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, how)
