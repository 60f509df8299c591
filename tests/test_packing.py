"""Sequence packing (operators/packing.py): exact equality vs a
pandas cumsum oracle, parallelism invariance of the distributed
prefix sum, hand-checked straddle semantics, per-pack stats, and the
plan-level guarantee that no single-partition exchange (the global-
window trap) appears."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.operators.packing import pack_sequences, pack_stats

SF_DIR = "/root/testdata/sf0.001"
CAP = 128


@pytest.fixture(scope="module")
def tok(spark):
    from reddit_processing_spark.functions.text import bpe_token_count

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return d.select("doc_id", bpe_token_count("text").alias("n_bpe")).cache()


def _pandas_oracle(pdf: pd.DataFrame, cap: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    cb = pdf["n_bpe"].cumsum().shift(1, fill_value=0)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "pack_id": (cb // cap).astype("int64"),
            "pack_offset": (cb % cap).astype("int64"),
            "straddles": (cb % cap + pdf["n_bpe"]) > cap,
        }
    )


def test_packing_matches_pandas_cumsum(spark, tok):
    got = (
        pack_sequences(tok, CAP, "n_bpe")
        .orderBy("doc_id")
        .toPandas()[["doc_id", "pack_id", "pack_offset", "straddles"]]
    )
    want = _pandas_oracle(tok.toPandas(), CAP)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_packing_parallelism_invariant(spark, tok):
    a = sorted(
        map(tuple, pack_sequences(tok, CAP, "n_bpe", num_partitions=2).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_sequences(
                tok.repartition(7), CAP, "n_bpe", num_partitions=16
            ).collect(),
        )
    )
    assert a == b


def test_packing_no_single_partition_window(spark, tok):
    """The naive global-window cumsum collapses the table into one
    task; the distributed prefix sum must not."""
    df = pack_sequences(tok, CAP, "n_bpe")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan


def test_packing_straddle_semantics(spark):
    """Hand case, capacity 10: docs of 4, 8, 10, 3 tokens ->
    offsets 0, 4, 12%10=2, 22%10=2; the 8-token doc straddles
    (4+8>10), the 10-token doc straddles (2+10>10)."""
    df = spark.createDataFrame(
        [(1, 4), (2, 8), (3, 10), (4, 3)], "doc_id long, n long"
    )
    got = {
        r.doc_id: (r.pack_id, r.pack_offset, r.straddles)
        for r in pack_sequences(df, 10, "n").collect()
    }
    assert got == {
        1: (0, 0, False),
        2: (0, 4, True),
        3: (1, 2, True),
        4: (2, 2, False),
    }


def test_pack_stats(spark):
    df = spark.createDataFrame(
        [(1, 4), (2, 8), (3, 10), (4, 3)], "doc_id long, n long"
    )
    st = {r.pack_id: (r.n_docs, r.n_started_tokens, r.straddle_in)
          for r in pack_stats(pack_sequences(df, 10, "n"), 10).collect()}
    assert st == {0: (2, 12, True), 1: (1, 10, True), 2: (1, 3, False)}


def test_packing_rejects_bad_capacity(spark, tok):
    with pytest.raises(ValueError):
        pack_sequences(tok, 0, "n_bpe")
