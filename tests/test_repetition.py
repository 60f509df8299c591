"""Gopher/RefinedWeb-style repetition signals vs a pandas oracle:
duplicate-line fraction and top-bigram fraction, including planted
repetitive documents and degenerate shapes (empty, single-token,
null)."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.functions.text import (
    dup_line_fraction,
    top_bigram_fraction,
)

SF_DIR = "/root/testdata/sf0.001"


def _dup_line(t):
    if t is None:
        return 0.0   # contract: NULL text scores 0.0, never NULL
    lines = [x.strip() for x in t.split("\n")]
    lines = [x for x in lines if x]
    if not lines:
        return 0.0
    return 1.0 - len(set(lines)) / len(lines)


def _top_bigram(t):
    if t is None:
        return 0.0   # contract: NULL text scores 0.0, never NULL
    t = t.strip()
    toks = re.split(r"\s+", t.lower()) if t else []
    if len(toks) < 2:
        return 0.0
    grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return Counter(grams).most_common(1)[0][1] / len(grams)


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    planted = pd.DataFrame(
        [
            {"doc_id": 800001, "text": "same line\nsame line\nother\nsame line",
             "lang": "en", "source": "t", "n_chars": 36},
            {"doc_id": 800002, "text": "buy now " * 50 + "unique tail",
             "lang": "en", "source": "t", "n_chars": 411},
            {"doc_id": 800003, "text": "", "lang": "en", "source": "t", "n_chars": 0},
            {"doc_id": 800004, "text": "word", "lang": "en", "source": "t",
             "n_chars": 4},
            {"doc_id": 800005, "text": None, "lang": "en", "source": "t",
             "n_chars": 0},
        ]
    )
    return spark.createDataFrame(
        pd.concat([base, planted], ignore_index=True)
    ).cache()


def test_repetition_signals_match_oracle(spark, docs):
    got = (
        docs.select(
            "doc_id",
            dup_line_fraction("text").alias("dlf"),
            top_bigram_fraction("text").alias("tbf"),
        )
        .toPandas()
        .set_index("doc_id")
    )
    pdf = docs.toPandas()
    for _, r in pdf.iterrows():
        e_d, e_t = _dup_line(r["text"]), _top_bigram(r["text"])
        g_d, g_t = got.loc[r["doc_id"], "dlf"], got.loc[r["doc_id"], "tbf"]
        assert abs(g_d - e_d) < 1e-12, (r["doc_id"], g_d, e_d)
        assert abs(g_t - e_t) < 1e-12, (r["doc_id"], g_t, e_t)
    # planted invariants
    assert abs(got.loc[800001, "dlf"] - 0.5) < 1e-12       # 4 lines, 2 dup
    assert got.loc[800002, "tbf"] > 0.45                   # "now buy" dominates
    assert got.loc[800003, "dlf"] == 0.0 == got.loc[800003, "tbf"]
    assert got.loc[800004, "tbf"] == 0.0                   # single token
    # NULL text: 0.0, NOT NULL — otherwise `frac <= threshold` quality
    # filters silently drop null-text rows (ANSI: size(split(NULL)) is
    # NULL and falls through every when() guard)
    assert got.loc[800005, "dlf"] == 0.0 == got.loc[800005, "tbf"]
