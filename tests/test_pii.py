"""PII scrubbing (functions/text.py PII_PATTERNS): planted-example
redaction, order-sensitivity, and cross-engine regex parity vs DuckDB
(the patterns are restricted to the Java-regex ∩ RE2 subset — this
test is what keeps that claim true)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.functions.text import (
    PII_PATTERNS,
    pii_count,
    redact_pii,
)


def test_redact_planted(spark):
    txt = (
        "mail bob.smith+x@corp.example.org or see "
        "https://ex.org/a?b=c@d.ee then ping 192.168.0.1 "
        "or call +14155550123 / 415-555-0123 end"
    )
    row = (
        spark.createDataFrame([(txt,)], "text string")
        .select(
            redact_pii("text").alias("red"),
            pii_count("text", "url").alias("u"),
            pii_count("text", "email").alias("e"),
            pii_count("text", "ipv4").alias("i"),
            pii_count("text", "phone").alias("p"),
        )
        .first()
    )
    # URL redacted FIRST, so the email-shaped substring inside it is
    # gone before the email pass; counts are over the RAW text, so the
    # embedded c@d.ee still counts as an email.
    assert row.red == (
        "mail <EMAIL> or see <URL> then ping <IP> or call <PHONE> / <PHONE> end"
    )
    assert (row.u, row.e, row.i, row.p) == (1, 2, 1, 2)


def test_pii_noop_on_clean_text(spark):
    txt = "nothing sensitive here at all, just words and 42 numbers"
    row = (
        spark.createDataFrame([(txt,)], "text string")
        .select(
            redact_pii("text").alias("red"),
            *[pii_count("text", k).alias(k) for k, _, _ in PII_PATTERNS],
        )
        .first()
    )
    assert row.red == txt
    assert all(row[k] == 0 for k, _, _ in PII_PATTERNS)


@pytest.mark.parametrize("kind,pat", [(k, p) for k, p, _ in PII_PATTERNS])
def test_pattern_parity_vs_duckdb(spark, kind, pat):
    """Match COUNTS agree engine-for-engine on the sf0.001 documents
    text enriched with the same id-derived PII suffix the driver entry
    uses — a drift in \\b / {m,} / class semantics between Java regex
    and RE2 would fail here before it failed the driver gate."""
    sf = "/root/testdata/sf0.001/documents.parquet"
    did = F.col("doc_id").cast("string")
    enriched = spark.read.parquet(sf).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" u"), did,
            F.lit("@ex.org https://x.io/"), did,
            F.lit(" 10.0.0."), (F.col("doc_id") % 200).cast("string"),
            F.lit(" +3312345"), F.lpad(did, 4, "0"),
        ).alias("t"),
    )
    sp = {
        r.doc_id: r.n
        for r in enriched.select(
            "doc_id",
            F.size(F.regexp_extract_all("t", F.lit(pat), F.lit(0))).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    du = dict(
        con.execute(
            f"""
            SELECT doc_id, len(regexp_extract_all(
              text || ' u' || doc_id || '@ex.org https://x.io/' || doc_id
                   || ' 10.0.0.' || (doc_id % 200) || ' +3312345'
                   || lpad(CAST(doc_id AS VARCHAR), 4, '0'),
              '{pat}')) AS n
            FROM read_parquet('{sf}')
            """
        ).fetchall()
    )
    assert sp == du and len(sp) > 0
