"""Persistent bucketing (operators/bucketing.py): a join of two
co-bucketed tables runs with NO Exchange on either side and returns
exactly what the plain (shuffling) join returns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.operators.bucketing import (
    is_shuffle_free,
    read_bucketed,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(o, "t_orders_b", "o_custkey", 8, path=str(root / "o"))
    write_bucketed(c, "t_customer_b", "o_custkey", 8, path=str(root / "c"))
    yield "t_orders_b", "t_customer_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_cobucketed_join_has_no_shuffle(spark, bucketed):
    """Join + groupBy on the bucket key: ZERO shuffle exchanges end to
    end (broadcast disabled so the co-located sort-merge path itself
    is what's proven, not a small-side shortcut)."""
    to, tc = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, to).join(read_bucketed(spark, tc), "o_custkey")
        agg = joined.groupBy("o_custkey").agg(
            F.count("*").alias("n"), F.sum("o_totalprice").alias("rev")
        )
        # force execution so executedPlan is the final (AQE) plan
        n = agg.count()
        assert n > 0
        assert is_shuffle_free(agg), agg._jdf.queryExecution().executedPlan().toString()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan and "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_equals_plain_join(spark, bucketed):
    to, tc = bucketed
    b = (
        read_bucketed(spark, to)
        .join(read_bucketed(spark, tc), "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    p = o.join(c, "o_custkey").groupBy("o_custkey").agg(F.count("*").alias("n"))
    got = {r.o_custkey: r.n for r in b.collect()}
    want = {r.o_custkey: r.n for r in p.collect()}
    assert got == want and len(got) > 0


def test_plain_path_read_loses_bucket_spec(spark, bucketed, tmp_path):
    """Reading the SAME files by path (not catalog) must NOT be
    treated as bucketed — the spec is metadata; this guards against
    assuming file layout implies co-partitioning."""
    to, tc = bucketed
    loc_o = spark.sql(f"DESCRIBE FORMATTED {to}").filter(
        F.col("col_name") == "Location"
    ).first().data_type
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o_path = spark.read.parquet(loc_o.replace("file:", ""))
        joined = o_path.join(read_bucketed(spark, tc), "o_custkey")
        joined.count()
        assert not is_shuffle_free(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
