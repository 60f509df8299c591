"""Extraction parity: Spark derive_edges == pandas oracle, exactly.

Covers BASELINE.json input_hint invariants: per-turn text byte-equality
under stable turn ordering; plus vid determinism / collision-freedom
and permutation invariance (SURVEY.md §5.2, §5.4a).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from oracle import extract as oext
from reddit_processing_spark.operators.extract import (
    aggregate_edges,
    derive_edges,
    extract_turns,
)


def _load_pandas(tiny_dir: str) -> pd.DataFrame:
    return pq.read_table(tiny_dir).to_pandas()


def _spark_keyed_edges(spark, tiny_dir):
    """Spark edges joined back to the vertex dictionary → keyed rows."""
    t = spark.read.parquet(tiny_dir)
    edges, vertices = derive_edges(t)
    v = vertices.cache()
    keyed = (
        edges.join(
            v.select(F.col("vid").alias("src"), F.col("vkey").alias("src_key"), F.col("vtype").alias("src_type")),
            "src",
        )
        .join(
            v.select(F.col("vid").alias("dst"), F.col("vkey").alias("dst_key"), F.col("vtype").alias("dst_type")),
            "dst",
        )
        .select("src_type", "src_key", "dst_type", "dst_key", "kind", "conv_id", "w")
    )
    return keyed, edges, vertices


def _multiset(df: pd.DataFrame) -> Counter:
    cols = ["src_type", "src_key", "dst_type", "dst_key", "kind", "conv_id", "w"]
    return Counter(map(tuple, df[cols].itertuples(index=False, name=None)))


def test_edge_parity_vs_oracle(spark, tiny_dir):
    keyed, edges, _ = _spark_keyed_edges(spark, tiny_dir)
    got = _multiset(keyed.toPandas())
    want = _multiset(oext.derive_edges(_load_pandas(tiny_dir)))
    assert got == want
    # join-back lost nothing (every edge endpoint resolved in the dict)
    assert edges.count() == sum(got.values())


def test_turn_text_byte_equality(spark, tiny_dir):
    """Per-turn text passes through the Spark pipeline byte-exact."""
    turns_spark = (
        extract_turns(spark.read.parquet(tiny_dir))
        .select("conv_id", "turn_idx", "text", "role", "ts")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    turns_oracle = (
        oext.extract_turns(_load_pandas(tiny_dir))[["conv_id", "turn_idx", "text", "role", "ts"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(turns_spark) == len(turns_oracle)
    # byte-level equality, including torture rows (tabs, newlines,
    # quotes, unicode, trailing spaces) and the empty-string row
    assert (
        turns_spark["text"].astype(object).eq(turns_oracle["text"].astype(object)).all()
    )
    assert turns_spark["conv_id"].equals(turns_oracle["conv_id"])
    assert turns_spark["turn_idx"].equals(turns_oracle["turn_idx"])
    # the injected duplicate lost: its text marker must be absent
    assert not turns_spark["text"].str.contains("dup-later-must-lose").any()


def test_vid_no_collisions(spark, tiny_dir):
    _, vertices = derive_edges(spark.read.parquet(tiny_dir))
    n = vertices.count()
    assert vertices.select("vid").distinct().count() == n


def test_permutation_invariance(spark, tiny_dir):
    """Shuffling physical input order must not change the edge multiset."""
    pdf = _load_pandas(tiny_dir)
    shuffled = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    t2 = spark.createDataFrame(shuffled)
    edges2, vertices2 = derive_edges(t2)
    agg2 = (
        aggregate_edges(edges2).toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    edges1, _ = derive_edges(spark.read.parquet(tiny_dir))
    agg1 = (
        aggregate_edges(edges1).toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(agg1, agg2)
