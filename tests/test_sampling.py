"""Deterministic sampling tests: parallelism invariance, split
disjointness/exhaustiveness, rate accuracy, key-consistency across
tables, exact-n stability, and the portable-hash ≡ DuckDB identity the
driver oracle relies on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.operators.sampling import (
    hash_split,
    portable_hash01,
    sample_fraction,
    stratified_sample,
    uniform_sample_n,
    weighted_sample_n,
    xxhash01,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").cache()


def test_hash_split_disjoint_exhaustive_and_invariant(spark, orders):
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = hash_split(orders, "o_orderkey", splits, salt=7)
    total = orders.count()
    counts = {r["split"]: r["n"] for r in
              s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == total            # exhaustive
    assert set(counts) <= set(splits)
    # each key in exactly one split, stable across partitionings
    a = s1.select("o_orderkey", "split").toPandas().set_index("o_orderkey")["split"]
    s2 = hash_split(orders.repartition(13), "o_orderkey", splits, salt=7)
    b = s2.select("o_orderkey", "split").toPandas().set_index("o_orderkey")["split"]
    assert dict(a) == dict(b)
    # rates within binomial noise (4 sigma)
    import math
    for name, p in splits.items():
        sigma = math.sqrt(total * p * (1 - p))
        assert abs(counts.get(name, 0) - total * p) < 4 * sigma + 1


def test_sample_fraction_key_consistency(spark, orders):
    """Sampling orders and (orders-derived) lineitem-like rows by the
    same key+salt keeps them consistent: every surviving child row's
    key survives in the parent sample."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    so = sample_fraction(orders, "o_orderkey", 0.3, salt=11)
    sl = sample_fraction(li, "l_orderkey", 0.3, salt=11)
    orphans = sl.join(
        so.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    )
    assert orphans.count() == 0


def test_stratified_rates(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    rates = {"BUILDING": 0.6, "AUTOMOBILE": 0.2}
    kept = stratified_sample(
        cust, "c_mktsegment", rates, "c_custkey", salt=3, default_rate=0.05
    )
    got = {
        r["c_mktsegment"]: r["n"]
        for r in kept.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r["c_mktsegment"]: r["n"]
        for r in cust.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
    }
    import math
    for seg, n in base.items():
        p = rates.get(seg, 0.05)
        sigma = math.sqrt(n * p * (1 - p))
        assert abs(got.get(seg, 0) - n * p) < 4 * sigma + 2, (seg, got.get(seg, 0), n * p)


def test_uniform_sample_n_exact_and_stable(spark, orders):
    s1 = uniform_sample_n(orders, "o_orderkey", 50, salt=5)
    s2 = uniform_sample_n(orders.repartition(17), "o_orderkey", 50, salt=5)
    k1 = sorted(r["o_orderkey"] for r in s1.select("o_orderkey").collect())
    k2 = sorted(r["o_orderkey"] for r in s2.select("o_orderkey").collect())
    assert len(k1) == 50 and k1 == k2
    # a different salt draws a different sample
    k3 = sorted(
        r["o_orderkey"]
        for r in uniform_sample_n(orders, "o_orderkey", 50, salt=6)
        .select("o_orderkey")
        .collect()
    )
    assert k1 != k3
    # plan: global top-n by hash must be TakeOrderedAndProject, not a full sort
    plan = s1._sc._jvm.PythonSQLUtils.explainString(
        s1._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_n_matches_numpy_oracle(spark, orders):
    """A-ES selection is a pure function of (key, weight, salt):
    recompute the exact same ln(u)/w top-n in numpy with the portable
    hash and require identical selection; weight-proportional
    inclusion sanity over many salts runs numpy-side (cheap)."""
    import numpy as np

    pdf = orders.select("o_orderkey", "o_totalprice").toPandas()
    keys = pdf["o_orderkey"].to_numpy(dtype=np.int64)
    w = pdf["o_totalprice"].to_numpy(dtype=np.float64)

    def u_of(salt):
        return ((keys * 2654435761 + salt) % 4294967296) / 4294967296.0

    got = weighted_sample_n(
        orders, "o_orderkey", "o_totalprice", 50, hash_fn=portable_hash01(9)
    )
    g = sorted(r["o_orderkey"] for r in got.select("o_orderkey").collect())
    score = np.log(u_of(9)) / w
    order = np.lexsort((keys, -score))
    e = sorted(keys[order[:50]].tolist())
    assert g == e
    # inclusion frequency tracks weight: over 300 salts, the top-decile
    # weight rows must be selected far more often than the bottom decile
    hi = w >= np.quantile(w, 0.9)
    lo = w <= np.quantile(w, 0.1)
    hits_hi = hits_lo = 0
    for s in range(300):
        sc = np.log(u_of(s)) / w
        top = np.argpartition(-sc, 49)[:50]
        sel = np.zeros(len(keys), dtype=bool)
        sel[top] = True
        hits_hi += sel[hi].sum()
        hits_lo += sel[lo].sum()
    assert hits_hi > 3 * max(hits_lo, 1)


def test_portable_hash_matches_duckdb_rowwise(spark, orders):
    """The driver-oracle identity: portable_hash01 membership in Spark
    equals the same arithmetic in DuckDB, row for row."""
    kept = sample_fraction(
        orders, "o_orderkey", 0.37, salt=99, hash_fn=portable_hash01(99)
    )
    spark_keys = sorted(r["o_orderkey"] for r in kept.select("o_orderkey").collect())
    con = duckdb.connect()
    duck_keys = [
        r[0]
        for r in con.execute(
            f"""
            SELECT o_orderkey FROM read_parquet('{SF_DIR}/orders.parquet')
            WHERE ((o_orderkey * 2654435761 + 99) % 4294967296) / 4294967296.0 < 0.37
            ORDER BY o_orderkey
            """
        ).fetchall()
    ]
    assert spark_keys == duck_keys


def test_xxhash_split_deterministic_across_sessions_shape(spark, orders):
    """xxhash01 path: same salt → identical membership on repeated
    evaluation (pure function, no per-task seed)."""
    a = sorted(
        r["o_orderkey"]
        for r in sample_fraction(orders, "o_orderkey", 0.2, salt=1)
        .select("o_orderkey").collect()
    )
    b = sorted(
        r["o_orderkey"]
        for r in sample_fraction(orders.repartition(9), "o_orderkey", 0.2, salt=1)
        .select("o_orderkey").collect()
    )
    assert a == b and len(a) > 0
