"""Corpus-statistics text scoring: TF-IDF and BM25 (Okapi) over the
documents table — the relevance/weighting layer a training-data
pipeline uses for quality filtering, dedup tie-breaking, and
retrieval-style mixture construction.

Shape at 100 TB (SURVEY.md §2.12):
- terms are exploded ONCE; per-(doc,term) counts and per-term document
  frequencies are hash aggregates with map-side partial combine (two
  shuffles total, each over rows that shrink as they aggregate);
- the idf table is |vocab|-sized — far smaller than the corpus — and
  joins back via broadcast below the threshold, shuffle-hash above it
  (AQE decides at runtime);
- corpus scalars (N, average document length) are one Observation-
  style aggregate broadcast via crossJoin — no driver-side loop, no
  second pass over the corpus;
- everything is built-in Column expressions (codegen'd); no Python on
  the row path.

All scores are deterministic; ordering tie-breaks are total
(score desc, term asc). DuckDB-oracle parity for the driver entry
uses the same ln()-based formulas (IEEE-double identical) with
round(4) guarding the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reddit_processing_spark.functions.text import ws_tokens


def doc_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf): lowercase whitespace terms with per-doc
    counts. Null/empty texts yield no rows (joined back with a left
    join by consumers that need every doc)."""
    toks = F.transform(ws_tokens(text_col), lambda x: F.lower(x))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_frequencies(terms: DataFrame) -> DataFrame:
    """(term, df): number of documents containing each term. Input is
    already distinct per (doc, term), so this is a plain count."""
    return terms.groupBy("term").agg(F.count("*").alias("df"))


def tfidf_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf, tfidf) with the smoothed formula
    ``tfidf = tf * (ln((N+1)/(df+1)) + 1)`` (sklearn-style smoothing:
    never zero, never negative)."""
    terms = doc_terms(docs, text_col, id_col)
    dfs = doc_frequencies(terms)
    n_docs = docs.select(F.count("*").alias("n_docs"))
    return (
        terms.join(dfs, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )


def top_terms(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, rk, term, tfidf): each document's top-n terms by
    (tfidf desc, term asc) — the deterministic 'what is this document
    about' fingerprint."""
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        tfidf_scores(docs, text_col, id_col)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .select("doc_id", "rk", "term", "tfidf")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bm25): Okapi BM25 of each document against a fixed
    term query — ``Σ_t ln(1 + (N−df+0.5)/(df+0.5)) · tf·(k1+1) /
    (tf + k1·(1−b+b·len/avglen))``. Documents matching no query term
    score 0.0 (every doc gets a row)."""
    q = [t.lower() for t in query_terms]
    terms = doc_terms(docs, text_col, id_col).filter(F.col("term").isin(q))
    # df over the query terms only: the isin filter runs BEFORE the
    # per-term aggregate, so the shuffle carries |q| keys, not |vocab|
    dfs = doc_frequencies(terms)
    lens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(ws_tokens(text_col)).cast("double").alias("dl"),
    )
    scal = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
    )
    per_term = (
        terms.join(F.broadcast(dfs), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (1 - b + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(F.sum("s").alias("bm25"))
    return (
        lens.select("doc_id")
        .join(scored, "doc_id", "left")
        .select("doc_id", F.coalesce("bm25", F.lit(0.0)).alias("bm25"))
    )
