"""Data-sized partition resolution for iterative graph loops
(graph/partitioning.py): explicit caller choice wins; otherwise the
count-derived value is clamped to [8, spark.sql.shuffle.partitions]."""

from __future__ import annotations

from reddit_processing_spark.graph.partitioning import resolve_partitions


def _edges(spark, n):
    return spark.range(n).selectExpr("id as src", "id + 1 as dst")


def test_explicit_wins(spark):
    assert resolve_partitions(spark, _edges(spark, 10), 17) == 17


def test_small_tier_floors_at_8(spark):
    assert resolve_partitions(spark, _edges(spark, 100), None) == 8


def test_mid_tier_sizes_from_rows(spark):
    # conftest session: shuffle.partitions = 8, so the cap binds here;
    # widen the conf temporarily to see the row-derived value
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        got = resolve_partitions(
            spark, _edges(spark, 1_600_000), None, target_rows=100_000
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert got == 16


def test_configured_width_caps(spark):
    # 10M rows / 100k = 100 > configured 8 -> capped at 8
    got = resolve_partitions(spark, _edges(spark, 10_000_000), None)
    assert got == int(spark.conf.get("spark.sql.shuffle.partitions"))
