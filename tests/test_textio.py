"""Byte-exact text round-trip through the CSV/TSV and NDJSON scans
(SURVEY.md §2.1 S1/S2; watch-list item 6: delimiter/quote/newline/
unicode torture rows).

The tiny transcripts fixture deliberately plants:
- TORTURE_SUFFIX rows (tab, newline, double quote, comma, pipe,
  multi-script unicode, trailing spaces — sources/fixtures.py),
- one empty-string text row (conv 3 turn 0) — must stay '' not NULL,
- NULL ``tool`` on every non-tool turn — must stay NULL not ''.

Equality is checked on the FULL row set (sorted multiset compare), so
ordering, duplication, and loss are all caught, then text byte-
equality is asserted pairwise.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.sources import textio
from reddit_processing_spark.sources.fixtures import TORTURE_SUFFIX


def _rows(df):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    out = [tuple(r) for r in df.select(*cols).collect()]
    return sorted(out, key=lambda t: (t[0], t[1], str(t[5]), str(t[3])))


@pytest.fixture(scope="module")
def transcripts(spark, tiny_dir):
    df = spark.read.parquet(os.path.join(tiny_dir, "*.parquet"))
    # sanity: the fixture really contains the torture cases
    n_torture = df.filter(F.col("text").endswith(TORTURE_SUFFIX)).count()
    assert n_torture > 0
    assert df.filter(F.col("text") == "").count() == 1
    assert df.filter(F.col("tool").isNull()).count() > 0
    return df


def test_csv_roundtrip_byte_exact(spark, transcripts, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv_rt") / "transcripts_tsv")
    textio.write_transcripts_csv(transcripts, path)
    back = textio.read_transcripts_csv(spark, path)
    orig, rt = _rows(transcripts), _rows(back)
    assert len(orig) == len(rt)
    for a, b in zip(orig, rt):
        assert a == b, f"row mismatch: {a!r} != {b!r}"
    # explicit byte-equality over the text payloads
    assert [a[3].encode() if a[3] is not None else None for a in orig] == [
        b[3].encode() if b[3] is not None else None for b in rt
    ]


def test_csv_comma_sep_roundtrip(spark, transcripts, tmp_path_factory):
    """Same contract with ',' as separator (the torture rows contain
    commas, so the quoting path is genuinely exercised)."""
    path = str(tmp_path_factory.mktemp("csv_rt") / "transcripts_csv")
    textio.write_transcripts_csv(transcripts, path, sep=",")
    back = textio.read_transcripts_csv(spark, path, sep=",")
    assert _rows(transcripts) == _rows(back)


def test_ndjson_roundtrip_byte_exact(spark, transcripts, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("json_rt") / "transcripts_json")
    textio.write_transcripts_ndjson(transcripts, path)
    back = textio.read_transcripts_ndjson(spark, path)
    assert _rows(transcripts) == _rows(back)


def test_null_vs_empty_distinction(spark, transcripts, tmp_path_factory):
    """NULL tool and empty-string text survive distinctly (the classic
    CSV conflation bug the NULL_TOKEN sentinel exists to prevent)."""
    path = str(tmp_path_factory.mktemp("csv_rt") / "null_empty")
    textio.write_transcripts_csv(transcripts, path)
    back = textio.read_transcripts_csv(spark, path)
    assert (
        back.filter(F.col("text") == "").count()
        == transcripts.filter(F.col("text") == "").count()
    )
    assert (
        back.filter(F.col("tool").isNull()).count()
        == transcripts.filter(F.col("tool").isNull()).count()
    )
    assert back.filter(F.col("text").isNull()).count() == transcripts.filter(
        F.col("text").isNull()
    ).count()
