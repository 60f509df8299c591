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
