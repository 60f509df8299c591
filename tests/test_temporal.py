"""As-of + range join semantics (operators/temporal.py) against a
hand-computed oracle and a pandas merge_asof cross-check."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.operators.temporal import asof_join, range_join_buckets


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2026-01-01T00:00:05")),
            (2, 10, _ts("2026-01-01T00:00:10")),  # ties right row exactly
            (3, 10, _ts("2026-01-01T00:00:02")),  # before any right row
            (4, 20, _ts("2026-01-01T00:01:00")),
            (5, 30, _ts("2026-01-01T00:00:01")),  # key with no right rows
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2026-01-01T00:00:03"), 100),
            (10, _ts("2026-01-01T00:00:10"), 101),
            (20, _ts("2026-01-01T00:00:30"), 200),
            (20, _ts("2026-01-01T00:00:50"), 201),
        ],
        "k long, rts timestamp, val long",
    )
    return left, right


def test_asof_inclusive(spark, frames):
    left, right = frames
    out = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts", value_cols=["val"])
        .orderBy("event_id")
        .collect()
    )
    got = {r["event_id"]: r["val"] for r in out}
    assert got == {1: 100, 2: 101, 3: None, 4: 201, 5: None}


def test_asof_exclusive(spark, frames):
    left, right = frames
    out = (
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            value_cols=["val"], inclusive=False,
        )
        .orderBy("event_id")
        .collect()
    )
    got = {r["event_id"]: r["val"] for r in out}
    # event 2 at 00:00:10 must NOT see the right row at 00:00:10
    assert got == {1: 100, 2: 100, 3: None, 4: 201, 5: None}


def test_asof_matches_pandas_merge_asof(spark, frames):
    left, right = frames
    out = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts", value_cols=["val"])
        .orderBy("event_id")
        .toPandas()
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("rts")
    exp = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k", direction="backward"
    ).sort_values("event_id")
    assert list(out["val"].fillna(-1)) == list(exp["val"].fillna(-1))


def test_range_join_buckets(spark):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 10.5), (4, 42.0)], "id long, v double"
    )
    buckets = spark.createDataFrame(
        [(0, 1.0, 10.0), (1, 11.0, 20.0), (4, 41.0, 50.0)],
        "bucket_id long, lo double, hi double",
    )
    out = {
        r["id"]: r["bucket_id"]
        for r in range_join_buckets(facts, buckets, "v").collect()
    }
    assert out == {1: 0, 2: 0, 3: None, 4: 4}


def test_range_join_is_broadcast(spark):
    facts = spark.createDataFrame([(1, 5.0)], "id long, v double")
    buckets = spark.createDataFrame([(0, 1.0, 10.0)], "bucket_id long, lo double, hi double")
    plan = range_join_buckets(facts, buckets, "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_null_value_from_matched_row_stays_null(spark):
    """A right row whose value is genuinely NULL must yield NULL — not
    a stale value backfilled from an OLDER right row — and with
    multiple value_cols every value comes from the SAME matched row
    (round-1 ADVICE)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01T00:00:20"))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2026-01-01T00:00:01"), 7, "old"),
            (10, _ts("2026-01-01T00:00:10"), None, "new"),
        ],
        "k long, rts timestamp, val long, tag string",
    )
    row = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", value_cols=["val", "tag"]
    ).collect()[0]
    assert row["tag"] == "new"
    assert row["val"] is None  # NOT 7


def test_asof_reserved_left_column_names(spark):
    """Left columns named like the old internals (_k/_ts/_side) must
    survive untouched (collision-proof generated names)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2026-01-01T00:00:05"), "x", 9)],
        "event_id long, k long, ts timestamp, _k string, _side long",
    )
    right = spark.createDataFrame(
        [(10, _ts("2026-01-01T00:00:03"), 100)], "k long, rts timestamp, val long"
    )
    row = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", value_cols=["val"]
    ).collect()[0]
    assert row["val"] == 100 and row["_k"] == "x" and row["_side"] == 9


def test_asof_value_col_conflict_raises(spark, frames):
    left, right = frames
    r2 = right.withColumnRenamed("val", "event_id")
    with pytest.raises(ValueError, match="collide with left columns"):
        asof_join(left, r2, on="k", left_ts="ts", right_ts="rts", value_cols=["event_id"])


def test_range_join_explicit_semantics(spark):
    """how='left' keeps out-of-bucket facts with NULL bucket columns;
    how='inner' drops them; anything else raises (round-2 ADVICE)."""
    import pytest

    from reddit_processing_spark.operators.temporal import range_join_buckets

    facts = spark.createDataFrame(
        [(1, 5.0), (2, 10.25), (3, 45.0)], "fid long, v double"
    )
    buckets = spark.createDataFrame(
        [(0, 1.0, 10.0), (4, 41.0, 50.0)], "bucket_id long, lo double, hi double"
    )
    left = range_join_buckets(facts, buckets, "v", how="left").toPandas()
    inner = range_join_buckets(facts, buckets, "v", how="inner").toPandas()
    assert len(left) == 3 and left.loc[left.fid == 2, "bucket_id"].isna().all()
    assert len(inner) == 2 and set(inner.fid) == {1, 3}
    with pytest.raises(ValueError):
        range_join_buckets(facts, buckets, "v", how="full")
