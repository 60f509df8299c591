"""Context-window chunking (functions/chunking.py): UDTF ↔ Column
parity, chunk-count identity, overlap reconstruction, and the exact
semantics the docs_token_stats DuckDB oracle states (SURVEY §2.9 F5).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.functions.chunking import (
    ChunkText,
    chunk_documents,
    chunk_text_column,
    register_chunk_udtf,
)

SF_DIR = "/root/testdata/sf0.001"

# edge-case corpus: empty, NULL, shorter-than-chunk, == stride,
# == chunk, one-over, exact multiple of stride, unicode codepoints
CASES = [
    (0, ""),
    (1, None),
    (2, "abc"),
    (3, "abcdef"),          # == stride for (8, 2)
    (4, "abcdefgh"),        # == chunk
    (5, "abcdefghi"),       # chunk + 1
    (6, "abcdef" * 4),      # 24 = 4 × stride
    (7, "héllo wörld ünïcode ascii tail padding here"),
    (8, "x" * 1000),
]
CHUNK, OVERLAP = 8, 2
STRIDE = CHUNK - OVERLAP


@pytest.fixture(scope="module")
def cases_df(spark):
    return spark.createDataFrame(CASES, "doc_id int, text string")


def _udtf_chunks(spark, df, chunk=CHUNK, overlap=OVERLAP):
    register_chunk_udtf(spark)
    df.createOrReplaceTempView("__chunk_cases")
    return spark.sql(
        f"SELECT d.doc_id, c.chunk_idx, c.chunk_text "
        f"FROM __chunk_cases d, LATERAL chunk_text(d.text, {chunk}, {overlap}) c"
    )


def test_udtf_column_parity_edge_cases(spark, cases_df):
    got_udtf = sorted(map(tuple, _udtf_chunks(spark, cases_df).collect()))
    got_col = sorted(
        map(tuple, chunk_documents(cases_df, CHUNK, OVERLAP).collect())
    )
    assert got_udtf == got_col
    # python oracle
    want = []
    for did, text in CASES:
        if not text:
            continue
        for k, s in enumerate(range(0, len(text), STRIDE)):
            want.append((did, k, text[s : s + CHUNK]))
    assert got_col == sorted(want)


def test_chunk_count_identity(spark, cases_df):
    counts = dict(
        chunk_documents(cases_df, CHUNK, OVERLAP)
        .groupBy("doc_id").count().collect()
    )
    for did, text in CASES:
        n = len(text) if text else 0
        want = math.ceil(n / STRIDE) if n else 0
        assert counts.get(did, 0) == want, (did, text)


def test_overlap_reconstruction(spark, cases_df):
    rows = (
        chunk_documents(cases_df, CHUNK, OVERLAP)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))).alias("cs"))
        .collect()
    )
    texts = {d: t for d, t in CASES}
    assert rows  # non-empty
    for r in rows:
        chunks = [c["chunk_text"] for c in r["cs"]]
        # non-last chunks each contribute their first STRIDE chars
        # (start → next start); the last contributes fully
        rebuilt = "".join(c[:STRIDE] for c in chunks[:-1]) + chunks[-1]
        assert rebuilt == texts[r["doc_id"]]
        n = len(texts[r["doc_id"]])
        for k, ch in enumerate(chunks):
            assert ch == texts[r["doc_id"]][k * STRIDE : k * STRIDE + CHUNK]
            # non-empty; full CHUNK width whenever the text allows it
            assert len(ch) == min(CHUNK, n - k * STRIDE) > 0


def _per_doc_fp(df):
    return df.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.md5(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s["chunk_text"],
            ), "\x1f")).alias("fp"),
    )


def test_parity_on_real_documents(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    a = _per_doc_fp(_udtf_chunks(spark, d, 256, 32))
    b = _per_doc_fp(chunk_documents(d, 256, 32)).withColumnsRenamed(
        {"n": "n2", "fp": "fp2"}
    )
    j = a.join(b, "doc_id")
    assert j.filter((F.col("n") != F.col("n2")) | (F.col("fp") != F.col("fp2"))).count() == 0
    n_docs = j.count()
    assert n_docs > 0 and a.count() == n_docs and b.count() == n_docs


def test_invalid_params_raise(spark, cases_df):
    with pytest.raises(ValueError):
        chunk_text_column("text", 0, 0)
    with pytest.raises(ValueError):
        chunk_text_column("text", 8, 8)
    with pytest.raises(Exception):  # UDTF surfaces the ValueError via Py4J
        _udtf_chunks(spark, cases_df, 8, 9).collect()


def test_no_shuffle_in_column_path(spark, cases_df):
    plan = chunk_documents(cases_df, CHUNK, OVERLAP)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
