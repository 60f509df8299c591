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
    null_vals = [
        F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols
    ]
    # _side orders right rows before (inclusive) or after (exclusive)
    # left rows at equal timestamps, realizing the boundary semantics
    # inside one total window order.
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *null_vals,
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0 if inclusive else 2).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l2.unionByName(r2).select(
        "_side",
        *[F.col(c) for c in left_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join_buckets(
    facts: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Non-equi range join: fact rows matched to the bucket whose
    ``[lo, hi]`` interval contains ``value_col``.

    The bucket table is small by construction (it defines a banding),
    so it is BROADCAST — the non-equi predicate then evaluates as a
    broadcast nested-loop join with no shuffle of the fact side, the
    only scalable plan for an interval predicate in Spark.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) <= F.col(hi_col))
    return facts.join(F.broadcast(buckets), cond, "left")
