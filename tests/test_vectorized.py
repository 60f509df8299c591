"""F3 scalar pandas_udf surface (SURVEY.md §2.9): float32 kernels vs
an exact NumPy oracle, plus the proof that the semantics genuinely
need the UDF (double-precision Column arithmetic gives different
bits)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.functions.vectorized import f32_horner, f32_logistic

COEFFS = [0.3, -1.7, 2.5, 0.01]  # highest degree first


def _horner32_oracle(vals):
    out = []
    for x in vals:
        if x is None or (isinstance(x, float) and np.isnan(x)):
            out.append(None)
            continue
        acc = np.float32(COEFFS[0])
        x32 = np.float32(x)
        for c in COEFFS[1:]:
            acc = np.float32(np.float32(acc * x32) + np.float32(c))
        out.append(float(np.float64(acc)))
    return out


@pytest.fixture(scope="module")
def values(spark):
    vals = [0.1, 1.0, -2.5, 3.14159, 1e-3, 123.456, None, 7.7]
    return spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "x": vals})
    ), vals


def test_f32_horner_matches_numpy_oracle(spark, values):
    df, vals = values
    got = (
        df.withColumn("y", f32_horner(COEFFS)(F.col("x")))
        .orderBy("i")
        .select("y")
        .toPandas()["y"]
        .tolist()
    )
    want = _horner32_oracle(vals)
    for g, w in zip(got, want):
        if w is None:
            assert g is None or (isinstance(g, float) and np.isnan(g))
        else:
            assert g == w  # bit-exact: same float32 op sequence


def test_f32_semantics_not_expressible_in_double(spark, values):
    """The same Horner chain in Column (double) arithmetic produces
    DIFFERENT bits for generic inputs — demonstrating the UDF carries
    real semantics, not convenience."""
    df, vals = values
    expr = F.lit(float(COEFFS[0]))
    for c in COEFFS[1:]:
        expr = expr * F.col("x") + F.lit(float(c))
    both = (
        df.withColumn("y32", f32_horner(COEFFS)(F.col("x")))
        .withColumn("y64", expr)
        .filter(F.col("x").isNotNull())
        .select("y32", "y64")
        .toPandas()
    )
    assert (both["y32"] != both["y64"]).any()
    # ...but they agree to float32 precision
    assert np.allclose(both["y32"], both["y64"], rtol=1e-5)


def test_f32_logistic_bounds_and_oracle(spark, values):
    df, vals = values
    got = (
        df.withColumn("p", f32_logistic(0.8, -0.1)(F.col("x")))
        .orderBy("i")
        .toPandas()["p"]
    )
    clean = got.dropna()
    # float32 sigmoid saturates to exactly 1.0 for large z — closed
    # bounds are the correct float32 contract.
    assert ((clean >= 0) & (clean <= 1)).all()
    v = np.array([x for x in vals if x is not None], dtype=np.float64).astype(np.float32)
    z = (np.float32(0.8) * v).astype(np.float32) + np.float32(-0.1)
    want = (np.float32(1.0) / (np.float32(1.0) + np.exp(-z, dtype=np.float32))).astype(np.float64)
    assert np.array_equal(np.sort(clean.to_numpy()), np.sort(want))


def test_grouped_agg_mad_matches_pandas_and_duckdb(spark):
    """F4 grouped-agg pandas UDF: exact MAD per group vs the pandas
    oracle AND DuckDB's built-in mad() — including an even-count group
    (interpolated median), a NULL, and an all-NULL group."""
    import duckdb

    from reddit_processing_spark.functions.vectorized import mad

    rows = [
        ("a", 1.0), ("a", 3.0), ("a", 7.0), ("a", 100.0),  # even count
        ("b", 5.0), ("b", None), ("b", 9.0), ("b", 2.0),   # null dropped
        ("c", None), ("c", None),                          # all-null -> NULL
    ]
    df = spark.createDataFrame(rows, "k string, x double")
    got = {
        r.k: r.m
        for r in df.groupBy("k").agg(mad("x").alias("m")).collect()
    }
    pdf = df.toPandas()
    for k, grp in pdf.groupby("k"):
        x = grp["x"].dropna()
        want = None if len(x) == 0 else float((x - x.median()).abs().median())
        assert got[k] == want, k
    duck = {
        k: m
        for k, m in duckdb.sql(
            "SELECT k, mad(x) FROM pdf GROUP BY k"
        ).fetchall()
    }
    assert got == duck
