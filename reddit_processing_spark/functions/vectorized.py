"""Scalar pandas UDFs (SURVEY.md §2.9 F3) — the Arrow-vectorized
escape hatch for semantics built-in Column expressions cannot express.

The only sanctioned Python execution path is Arrow-batched
(BASELINE.json input_hint: "vectorized pandas/Arrow UDFs, no per-row
Python"); built-in Column functions cover every relational need in
this engine, so this surface is deliberately tiny and exists for
kernels whose RESULTS depend on single-precision (float32) rounding —
Spark Column arithmetic always widens to double, so no built-in
composition can reproduce them. The canonical use is scoring-model
parity: replaying a float32-trained calibration polynomial
bit-identically to its training-time evaluation.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def f32_horner(coeffs: Sequence[float]):
    """Scalar pandas UDF evaluating a polynomial by Horner's rule in
    STRICT float32 (coefficients, input, and every intermediate are
    rounded to single precision), returned as double.

    ``coeffs`` are highest-degree first. The whole Series evaluates
    as NumPy array ops — one Arrow batch in, one out, no per-row
    Python."""
    c32 = np.asarray(list(coeffs), dtype=np.float32)
    if c32.ndim != 1 or len(c32) == 0:
        raise ValueError("coeffs must be a non-empty 1-D sequence")

    @pandas_udf("double")
    def _eval(x: pd.Series) -> pd.Series:
        v = x.to_numpy(dtype=np.float64).astype(np.float32)
        acc = np.full(v.shape, c32[0], dtype=np.float32)
        for c in c32[1:]:
            acc = (acc * v).astype(np.float32) + c
        out = acc.astype(np.float64)
        out[x.isna().to_numpy()] = np.nan
        return pd.Series(out).where(~x.isna(), None)

    return _eval


# returnType as a DataType instance (not a DDL string): DDL parsing
# would require an active SparkSession at module-import time.
@pandas_udf(DoubleType())
def mad(v: pd.Series) -> float:
    """Grouped-agg pandas UDF (SURVEY.md §2.9 F4): exact median
    absolute deviation, ``median(|x - median(x)|)`` per group.

    Why a grouped-agg UDF and not built-ins: the inner ``median(x)``
    must be known before the deviation column exists, so no single
    built-in aggregate expression can compute MAD — the relational
    rewrite is a groupBy + self-join back to the rows (two shuffles of
    the fact table). The grouped-agg UDF does it in ONE grouped pass:
    each group's values arrive as one Arrow batch and reduce to one
    scalar, NumPy-vectorized (no per-row Python).

    Exactness: medians linearly interpolate at even counts (pandas
    ``Series.median`` ≡ DuckDB ``quantile_cont 0.5`` ≡ DuckDB
    ``mad()``), so on integer-valued inputs the result is exact
    (integers and .5 halves are exactly representable) — which is what
    makes the driver entry hash-checkable against DuckDB.

    Scale contract (the documented F4 trade-off): a grouped-agg UDF
    materializes each GROUP in executor memory (medians are holistic —
    that's inherent to the semantics, not the implementation). Use for
    bounded-cardinality groups; for approximate percentile-style
    rollups over unbounded groups use ``F.percentile_approx``.
    NULLs are dropped (SQL aggregate semantics); an all-NULL/empty
    group yields NULL."""
    x = v.dropna()
    if len(x) == 0:
        return None
    return float((x - x.median()).abs().median())


def f32_logistic(a: float = 1.0, b: float = 0.0):
    """Scalar pandas UDF: sigmoid(a*x + b) computed in float32 — the
    shape of an exported quality-classifier head replayed at
    training precision."""
    a32, b32 = np.float32(a), np.float32(b)

    @pandas_udf("double")
    def _eval(x: pd.Series) -> pd.Series:
        v = x.to_numpy(dtype=np.float64).astype(np.float32)
        z = (a32 * v).astype(np.float32) + b32
        out = (np.float32(1.0) / (np.float32(1.0) + np.exp(-z, dtype=np.float32))).astype(
            np.float64
        )
        return pd.Series(out).where(~x.isna(), None)

    return _eval
