"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()``
through DuckDB — row count, column names, and exact values (order-
insensitive). Rows-only entries are executed for rows>=0 and schema
stability."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in entrymod.__dict__.get("_TABLES", None) or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None).astype("datetime64[ns]")
        elif isinstance(out[c].dtype, pd.CategoricalDtype):
            out[c] = out[c].astype(str)
    cols = sorted(out.columns)
    return out[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def assert_match(name: str, sp: pd.DataFrame, du: pd.DataFrame) -> None:
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: columns {sorted(sp.columns)} != {sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: rows {len(sp)} != {len(du)}"
    a, b = normalize(sp), normalize(du)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.isclose(
                a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=1e-9, equal_nan=True
            ).all()
        else:
            ok = a[c].equals(b[c])
        assert ok, f"{name}: column {c} mismatch\nspark:\n{a[c].head()}\nduck:\n{b[c].head()}"


ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_oracled_query(spark, duck, name):
    q = entrymod.queries()[name]
    sp = q(spark, SF_DIR).toPandas()
    du = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert_match(name, sp, du)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
