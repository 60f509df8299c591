"""Deterministic sampling & dataset splitting — the selection
operators a training-data pipeline runs before anything else (held-out
splits, per-source mixing rates, fixed-size eval draws).

Everything here is a pure function of (row key, salt): no ``rand()``,
no ``TABLESAMPLE`` (both are partition-layout- or seed-per-task-
dependent and violate SURVEY §4.3 determinism). Consequences that
matter at 100 TB:

- **re-ingest stable**: the same row lands in the same split/sample on
  every run, on any cluster size, under any partitioning — proven by
  parallelism-invariance tests;
- **no shuffle**: ``hash_split`` and ``stratified_sample`` are pure
  Column predicates evaluated inside the scan's codegen stage (filter
  pushdown applies); ``uniform_sample_n`` is a global top-n by hash —
  Spark plans TakeOrderedAndProject (per-partition heaps + driver
  merge), never a full sort;
- **joinable**: because membership is keyed, two tables sampled with
  the same key+salt stay consistent (sample the users table and the
  events table with salt S and the kept events all have kept users).

``hash_fn(key_col) -> Column in [0,1)`` is pluggable: the default is
``xxhash64`` (full 64-bit avalanche). The driver oracle entry passes
``portable_hash01`` — a multiplicative hash expressible identically in
ANSI SQL — so the WHOLE operator (not a summary of it) is verified
against DuckDB row-for-row. xxhash64 determinism is covered in pytest.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HashFn = Callable[[Column], Column]


def xxhash01(salt: int = 0) -> HashFn:
    """Default: xxhash64 mapped to [0,1). Signed 64-bit → unit
    interval via h/2^64 + 0.5 (exact: double has 53-bit mantissa but
    the scale factor is a power of two, so ordering is preserved and
    the map is deterministic)."""

    def fn(key: Column) -> Column:
        return F.xxhash64(F.lit(salt), key) / F.lit(float(2**64)) + F.lit(0.5)

    return fn


def portable_hash01(salt: int = 0) -> HashFn:
    """Knuth multiplicative hash → [0,1), written in arithmetic every
    ANSI SQL engine evaluates identically (used by the DuckDB driver
    oracle): ((key*2654435761 + salt) % 2^32) / 2^32. Exact in double
    (numerator < 2^32, divisor a power of two). Caller must keep
    key*2654435761 within int64 (keys < ~3.4e9 — true for every driver
    table; the xxhash default has no such bound)."""

    def fn(key: Column) -> Column:
        h = F.pmod(
            key.cast("long") * F.lit(2654435761).cast("long")
            + F.lit(int(salt)).cast("long"),
            F.lit(4294967296).cast("long"),
        )
        return h / F.lit(4294967296.0)

    return fn


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float],
    salt: int = 0,
    hash_fn: HashFn | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint+exhaustive dataset split: adds
    ``out_col`` ∈ splits.keys() by cumulative thresholds over the unit
    hash. ``splits`` values must sum to 1.0 (the last named split
    absorbs the remainder, so every row gets a label)."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    fn = hash_fn or xxhash01(salt)
    u = fn(F.col(key_col))
    names = list(splits)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    label = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, label)


def sample_fraction(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: int = 0,
    hash_fn: HashFn | None = None,
) -> DataFrame:
    """Deterministic Bernoulli-by-key sample: keep rows with
    hash01(key) < rate. All rows sharing a key are kept or dropped
    TOGETHER (the property that keeps sampled fact tables consistent
    with sampled dimensions)."""
    fn = hash_fn or xxhash01(salt)
    return df.filter(fn(F.col(key_col)) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: Mapping[str, float],
    key_col: str,
    salt: int = 0,
    default_rate: float = 0.0,
    hash_fn: HashFn | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling (data-mixing rates): keep a
    row iff hash01(key) < rates[stratum] (``default_rate`` for strata
    not listed). Pure Column predicate — the rate table is folded into
    a CASE expression, no join, no shuffle."""
    fn = hash_fn or xxhash01(salt)
    rate_expr = None
    for name, r in rates.items():
        cond = F.col(stratum_col) == F.lit(name)
        rate_expr = (
            F.when(cond, float(r))
            if rate_expr is None
            else rate_expr.when(cond, float(r))
        )
    rate_expr = (
        F.lit(float(default_rate))
        if rate_expr is None
        else rate_expr.otherwise(float(default_rate))
    )
    return df.filter(fn(F.col(key_col)) < rate_expr)


def weighted_sample_n(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: int = 0,
    hash_fn: HashFn | None = None,
) -> DataFrame:
    """Exactly-n weighted sample WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row scores ``ln(u)/w`` with deterministic
    ``u = hash01(key)`` and the n highest scores win — inclusion
    probability rises with weight, selection is a pure function of
    (key, weight, salt). Distributed shape is the same
    TakeOrderedAndProject top-n as ``uniform_sample_n``. Rows with
    non-positive weight are excluded (A-ES is undefined there);
    ``u == 0`` maps to −inf and simply never wins."""
    fn = hash_fn or xxhash01(salt)
    score = F.log(fn(F.col(key_col))) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .orderBy(score.desc(), F.col(key_col).asc())
        .limit(n)
    )


def uniform_sample_n(
    df: DataFrame,
    key_col: str,
    n: int,
    salt: int = 0,
    hash_fn: HashFn | None = None,
) -> DataFrame:
    """Exactly-n uniform sample without replacement (distinct keys
    assumed): the n smallest rows by (hash01(key), key). Equivalent to
    a seeded reservoir sample but deterministic and distributed —
    Spark plans TakeOrderedAndProject (per-partition top-n heaps, no
    global sort, no driver-side state beyond n rows)."""
    fn = hash_fn or xxhash01(salt)
    # sort by the hash EXPRESSION directly — a temp column would
    # clobber any same-named user column, and TakeOrderedAndProject
    # handles computed sort keys without materializing them
    return df.orderBy(fn(F.col(key_col)).asc(), F.col(key_col).asc()).limit(n)
