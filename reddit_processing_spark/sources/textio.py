"""Text-format scans/sinks: TSV/CSV and NDJSON (SURVEY.md §2.1 S1/S2).

The reference's entire raw-input surface is monthly TSV/CSV dump files
(and pushshift-style NDJSON) with a fixed schema per record type
(SURVEY.md §2.1 [R-MED]); this module is that surface re-expressed as
Spark's native text datasources with the options pinned so that free
text survives BYTE-EXACTLY through a write→read round-trip — the
"per-turn text equality" contract (BASELINE.json input_hint) extended
to the text formats.

Why every option is what it is (the round-trip contract):

- ``escape='"'``       RFC-4180 doubled-quote escaping. Spark's
                       default escape is backslash, which does NOT
                       round-trip text that itself contains
                       backslash-quote sequences.
- ``multiLine=True``   (read) fields may contain raw newlines; the
                       writer quotes them, the reader must not treat
                       them as record separators. NOTE: multiLine
                       makes a file non-splittable — see the scale
                       note below.
- ``nullValue=NULL_TOKEN`` a sentinel (``\\N``, the classic MySQL
                       dump token) distinguishes SQL NULL from the
                       empty string: null writes as ``\\N`` unquoted,
                       the empty string writes as an empty field.
                       Without this, Spark's default (null ↔ empty
                       string ↔ "") silently conflates the two.
                       KNOWN IN-BAND LIMIT (property-tested): a text
                       value that IS the literal two characters
                       ``\\N`` reads back as NULL — Spark's CSV codec
                       applies the sentinel even to quoted fields, so
                       no sentinel choice can be fully out-of-band.
                       This is inherent to sentinel-based CSV (the
                       reference's TSV dumps share it); payloads that
                       may legitimately contain the sentinel belong
                       in NDJSON, which round-trips ALL strings
                       losslessly (JSON has real null).
- ``timestampFormat``  microsecond precision on both sides (the
                       parquet fixtures carry µs; the default write
                       format truncates).
- ``mode='FAILFAST'``  a malformed row is a data bug, not a row to
                       silently null out (PERMISSIVE would).
- explicit ``schema``  never infer: inference samples the data (extra
                       pass, nondeterministic types at scale).

Scale note (100 TB): ``multiLine=True`` disables input-file splitting
— each file is one task. That is the CORRECT trade for dump files
with embedded newlines (the reference's per-file process-pool has the
same granularity); keep individual dump files in the 100 MB–1 GB
range so task granularity stays healthy. When the text column is
known newline-free, pass ``multiline=False`` and files split freely.
NDJSON never needs multiLine (one JSON object per physical line; the
JSON encoding escapes embedded newlines as ``\\n``) and is therefore
the preferred splittable text format at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schema import TRANSCRIPTS

NULL_TOKEN = "\\N"
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _csv_options(sep: str, multiline: bool) -> dict[str, str]:
    return {
        "sep": sep,
        "quote": '"',
        "escape": '"',
        # emptyValue stays at its per-side default on purpose: the
        # writer emits the empty string as a QUOTED empty field ("")
        # and the reader maps ("") back to '' — while null writes as
        # the unquoted NULL_TOKEN. Overriding emptyValue to '' on the
        # writer collapses '' into an unquoted empty field, which any
        # CSV reader must treat as null — conflation again.
        "nullValue": NULL_TOKEN,
        # BOTH timestamp flavors: parquet written without a timezone
        # (isAdjustedToUTC=false) reads back as TIMESTAMP_NTZ, and the
        # CSV codec formats NTZ columns with timestampNTZFormat — left
        # at its default the two sides disagree and parsing FAILFASTs.
        "timestampFormat": TS_FORMAT,
        "timestampNTZFormat": TS_FORMAT,
        # explicit record separator: with lineSep unset the parser
        # NORMALIZES \r\n inside quoted fields to \n (byte-equality
        # violation, caught by the property test); pinned to \n the
        # embedded \r\n survives exactly.
        "lineSep": "\n",
        "multiLine": str(bool(multiline)).lower(),
        "header": "false",
        # Spark's CSV WRITER trims field whitespace by default — that
        # silently mutates text payloads with leading/trailing blanks
        # (byte-equality violation); the reader defaults are already
        # false, pin both sides.
        "ignoreLeadingWhiteSpace": "false",
        "ignoreTrailingWhiteSpace": "false",
    }


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = "\t",
    num_files: int | None = None,
) -> None:
    """Write ``df`` as TSV/CSV with the round-trip option block.

    ``num_files`` coalesces the output (dump files are per-month
    single files in the reference layout); default keeps the input
    partitioning (one file per partition — the scale path)."""
    out = df.coalesce(num_files) if num_files else df
    (
        out.write.mode("overwrite")
        .options(**_csv_options(sep, multiline=True))
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = "\t",
    multiline: bool = True,
) -> DataFrame:
    """Scan TSV/CSV with an explicit schema, byte-exact text, FAILFAST."""
    return (
        spark.read.schema(schema)
        .options(**_csv_options(sep, multiline))
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_ndjson(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write newline-delimited JSON (pushshift-style dump layout).

    JSON escaping makes the files line-splittable regardless of text
    content — the preferred text interchange format at scale."""
    out = df.coalesce(num_files) if num_files else df
    (
        out.write.mode("overwrite")
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_FORMAT)
        .option("ignoreNullFields", "false")
        .json(path)
    )


def read_ndjson(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Scan NDJSON with an explicit schema (never inferred), FAILFAST."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_FORMAT)
        .option("mode", "FAILFAST")
        .json(path)
    )


# ---- transcripts-shaped convenience wrappers (the reference's dump
# ---- ingestion path applied to the BASELINE.json input schema)
def write_transcripts_csv(df: DataFrame, path: str, sep: str = "\t") -> None:
    write_csv(df.select([f.name for f in TRANSCRIPTS.fields]), path, sep=sep)


def read_transcripts_csv(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    return read_csv(spark, path, TRANSCRIPTS, sep=sep, multiline=True)


def write_transcripts_ndjson(df: DataFrame, path: str) -> None:
    write_ndjson(df.select([f.name for f in TRANSCRIPTS.fields]), path)


def read_transcripts_ndjson(spark: SparkSession, path: str) -> DataFrame:
    return read_ndjson(spark, path, TRANSCRIPTS)
