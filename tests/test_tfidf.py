"""TF-IDF / BM25 tests against a pure-pandas oracle on the driver
documents table (+ planted edge cases: empty text, repeated terms)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.operators.tfidf import (
    bm25_scores,
    doc_frequencies,
    doc_terms,
    tfidf_scores,
    top_terms,
)

SF_DIR = "/root/testdata/sf0.001"


def _toks(t: str) -> list[str]:
    t = (t or "").strip()
    return re.split(r"\s+", t.lower()) if t else []


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    extra = pd.DataFrame(
        [
            {"doc_id": 700001, "text": "", "lang": "en", "source": "t", "n_chars": 0},
            {"doc_id": 700002, "text": "alpha alpha alpha beta", "lang": "en",
             "source": "t", "n_chars": 22},
        ]
    )
    pdf = pd.concat([base, extra], ignore_index=True)
    return spark.createDataFrame(pdf).cache()


@pytest.fixture(scope="module")
def oracle(docs):
    pdf = docs.toPandas()
    term_rows = []
    for _, r in pdf.iterrows():
        for t in _toks(r["text"]):
            term_rows.append((r["doc_id"], t))
    tdf = pd.DataFrame(term_rows, columns=["doc_id", "term"])
    tf = tdf.groupby(["doc_id", "term"]).size().rename("tf").reset_index()
    df_ = tf.groupby("term")["doc_id"].nunique().rename("df").reset_index()
    N = len(pdf)
    merged = tf.merge(df_, on="term")
    merged["tfidf"] = merged["tf"] * (np.log((N + 1) / (merged["df"] + 1)) + 1.0)
    return pdf, tf, df_, merged, N


def test_doc_terms_and_df(spark, docs, oracle):
    _, tf, df_, _, _ = oracle
    got_tf = doc_terms(docs).toPandas()
    a = got_tf.sort_values(["doc_id", "term"]).reset_index(drop=True)
    b = tf.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert list(a["term"]) == list(b["term"])
    assert (a["tf"].to_numpy() == b["tf"].to_numpy()).all()
    got_df = doc_frequencies(doc_terms(docs)).toPandas()
    c = got_df.sort_values("term").reset_index(drop=True)
    d = df_.sort_values("term").reset_index(drop=True)
    assert list(c["term"]) == list(d["term"])
    assert (c["df"].to_numpy() == d["df"].to_numpy()).all()
    # empty doc contributes no terms
    assert 700001 not in set(a["doc_id"])


def test_tfidf_matches_oracle(spark, docs, oracle):
    _, _, _, merged, _ = oracle
    got = tfidf_scores(docs).toPandas()
    a = got.sort_values(["doc_id", "term"]).reset_index(drop=True)
    b = merged.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert np.allclose(a["tfidf"].to_numpy(), b["tfidf"].to_numpy(), atol=1e-9)


def test_top_terms_deterministic(spark, docs, oracle):
    _, _, _, merged, _ = oracle
    got = top_terms(docs, n=2).toPandas()
    # repeated-term doc: 'alpha' (tf 3) must be its #1 term
    mine = got[got.doc_id == 700002].sort_values("rk")
    assert list(mine["term"])[:1] == ["alpha"]
    # oracle: same (tfidf desc, term asc) total order
    exp = (
        merged.sort_values(
            ["doc_id", "tfidf", "term"], ascending=[True, False, True]
        )
        .groupby("doc_id")
        .head(2)
    )
    exp_top = {
        (r.doc_id, i + 1): r.term
        for _, g in exp.groupby("doc_id")
        for i, r in enumerate(g.itertuples())
    }
    for r in got.itertuples():
        assert exp_top[(r.doc_id, r.rk)] == r.term, (r.doc_id, r.rk)
    # invariance across partitionings
    got2 = top_terms(docs.repartition(11), n=2).toPandas()
    k1 = got.sort_values(["doc_id", "rk"]).reset_index(drop=True)
    k2 = got2.sort_values(["doc_id", "rk"]).reset_index(drop=True)
    assert list(k1["term"]) == list(k2["term"])


def test_bm25_matches_oracle(spark, docs, oracle):
    pdf, tf, df_, _, N = oracle
    q = ["the", "alpha", "data"]
    k1, b = 1.2, 0.75
    lens = {r["doc_id"]: len(_toks(r["text"])) for _, r in pdf.iterrows()}
    avgdl = sum(lens.values()) / N
    dfq = dict(zip(df_["term"], df_["df"]))
    exp = {}
    for _, r in pdf.iterrows():
        s = 0.0
        toks = _toks(r["text"])
        for t in q:
            c = toks.count(t)
            if c == 0 or t not in dfq:
                continue
            idf = math.log(1 + (N - dfq[t] + 0.5) / (dfq[t] + 0.5))
            s += idf * c * (k1 + 1) / (c + k1 * (1 - b + b * lens[r["doc_id"]] / avgdl))
        exp[r["doc_id"]] = s
    got = bm25_scores(docs, q, k1=k1, b=b).toPandas()
    assert len(got) == N  # every doc scored, zero for no-match
    for r in got.itertuples():
        assert abs(r.bm25 - exp[r.doc_id]) < 1e-9, (r.doc_id, r.bm25, exp[r.doc_id])
    assert got.set_index("doc_id").loc[700001, "bm25"] == 0.0
