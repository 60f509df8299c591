"""Z-order (Morton) clustering key — multi-column data skipping for
the compaction path (operators/maintenance.py), the analog of
Iceberg/Delta ``rewrite_data_files(strategy='sort', sort_order=
zorder(...))``.

A single-column sort gives tight row-group min/max statistics on ONE
column; predicates on any other column skip nothing. Interleaving the
bits of k columns (after linear min→max normalization into 2^bits
bins) yields a space-filling curve: sorting by it bounds every file's
extent in EVERY participating dimension (±curve discontinuities), so
selective scans on any of the k columns skip most row groups.

All pure Column bit arithmetic (shiftleft/shiftright/bitwiseOR —
whole-stage codegen'd, no Python, no UDF); the only driver state is
one (min, max) pair per column from a single scalar aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of k ALREADY-NORMALIZED
    non-negative long columns (values clamped to [0, 2^bits));
    k·bits ≤ 63. Column j contributes its bit i at position i·k + j."""
    k = len(cols)
    if k < 1 or k * bits > 63:
        raise ValueError(f"morton_key: need 1 <= k*bits <= 63, got k={k} bits={bits}")
    cap = F.lit((1 << bits) - 1).cast("long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cc = F.least(F.greatest((F.col(c) if isinstance(c, str) else c).cast("long"),
                                F.lit(0).cast("long")), cap)
        for i in range(bits):
            bit = F.shiftright(cc, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton key over ``cols`` after linear min→max binning into
    2^bits buckets per column (one scalar aggregate for the bounds —
    bounded driver state; constant columns pin to bin 0).

    Linear binning (not rank binning) is the standard engine choice:
    it needs no per-row rank pass, and skewed value mass only costs
    curve resolution, not correctness."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    n_bins = float(1 << bits)
    normed = []
    for c in cols:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            normed.append(F.lit(0).cast("long"))
        else:
            normed.append(
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo))
                    * F.lit(n_bins / (hi - lo + 1e-12))
                ).cast("long")
            )
    return morton_key(normed, bits)
