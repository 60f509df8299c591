"""Property-based byte-exactness for the text scans (SURVEY.md §5.4):
arbitrary unicode payloads — not just the fixture's torture rows —
must survive CSV and NDJSON round-trips exactly, including empty
strings, quotes, delimiters, newlines (\\n and \\r\\n), and the null
sentinel's own literal characters.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from reddit_processing_spark.sources import textio

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("payload", T.StringType(), True),
    ]
)

payloads = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=40),
        st.sampled_from(
            [
                "",
                "\\N",          # the null sentinel as LITERAL text
                'a"b""c',
                "tab\there",
                "nl\nthere",
                "crlf\r\nthere",
                " lead-and-trail ",
                ",|;\t",
                "é😀中文مرحبا",
            ]
        ),
    ),
    min_size=1,
    max_size=12,
)


@pytest.mark.parametrize("fmt", ["csv", "ndjson"])
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=payloads)
def test_text_roundtrip_property(spark, tmp_path_factory, fmt, vals):
    df = spark.createDataFrame(list(enumerate(vals)), SCHEMA)
    path = str(tmp_path_factory.mktemp("rt") / "t")
    if fmt == "csv":
        textio.write_csv(df, path, sep="\t")
        back = textio.read_csv(spark, path, SCHEMA, sep="\t")
    else:
        textio.write_ndjson(df, path)
        back = textio.read_ndjson(spark, path, SCHEMA)
    got = {r["id"]: r["payload"] for r in back.collect()}
    want = dict(enumerate(vals))
    if fmt == "csv":
        # documented in-band limit (sources/textio.py): a payload that
        # IS the literal null sentinel reads back as NULL in CSV; every
        # other string round-trips byte-exactly. NDJSON is lossless.
        want = {k: (None if v == textio.NULL_TOKEN else v) for k, v in want.items()}
    assert got == want
