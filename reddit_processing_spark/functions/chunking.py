"""Context-window document chunking — the engine's UDTF surface
(SURVEY.md §2.9 F5) plus its pure-Column hot-path twin.

A training-data pipeline slices every document into fixed-size
overlapping windows before tokenization/packing; that is a
one-row-to-many-rows (table-generating) transform, which is exactly
the shape Spark 4's Python UDTF API exists for. Two implementations,
parity-asserted in tests/test_chunking.py:

- :func:`chunk_text_column` — built-in Column program
  (``sequence`` over window starts → ``transform`` + ``substr`` →
  caller explodes). JVM-side, whole-stage-codegen'd, zero Python.
  **This is the hot path** for corpus-scale chunking.
- :class:`ChunkText` — an Arrow-enabled Python UDTF
  (``@udtf(useArrow=True)``) registered by
  :func:`register_chunk_udtf`, consumed from SQL as a correlated
  ``LATERAL chunk_text(d.text, C, O)`` join. UDTF ``eval`` is
  per-row *by the API's spec*; the Arrow flag keeps the
  executor↔worker transfer batched, and the engine sanctions the
  UDTF only on this lateral cold path (driver-scale document sets,
  exploratory SQL) — the contract's per-row-Python ban
  [C:BASELINE.json input_hint] continues to hold on every hot path,
  where the Column twin runs instead.

Chunking semantics (identical in both paths and in the DuckDB oracle
of the ``docs_token_stats`` driver entry):

- window of ``chunk`` characters every ``stride = chunk - overlap``
  characters: starts 0, s, 2s, … while ``start < length(text)``;
- the last window may be shorter than ``chunk`` (never empty);
- empty/NULL text yields **zero** rows (n_chunks = 0), so
  ``ceil(len / stride)`` is the exact chunk count for len > 0;
- character (codepoint) units, not bytes — Spark ``substr`` and
  DuckDB ``substr`` agree on codepoints, so the oracle is portable.

Scale notes (100 TB design): chunking is embarrassingly parallel —
no shuffle, no state, fuses into the document scan in both paths.
Output row count is ×ceil(len/stride) of the input, so downstream
ops should re-partition by a chunk-level key if chunk rows feed a
wide operation; the functions here deliberately return narrow
(doc_id-preserving) rows and leave partitioning to the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

__all__ = [
    "ChunkText",
    "register_chunk_udtf",
    "chunk_text_column",
    "chunk_documents",
]


@udtf(returnType="chunk_idx: int, chunk_text: string", useArrow=True)
class ChunkText:
    """Explode one document into overlapping character windows.

    SQL shape (after :func:`register_chunk_udtf`)::

        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM documents d, LATERAL chunk_text(d.text, 256, 32) c

    ``eval`` is a generator: yielding (not list-building) keeps peak
    memory at one window regardless of document length.
    """

    def eval(self, text, chunk: int, overlap: int):  # noqa: D102
        if chunk is None or overlap is None:
            raise ValueError("chunk_text: chunk/overlap must be non-NULL")
        if chunk <= 0 or overlap < 0 or overlap >= chunk:
            raise ValueError(
                f"chunk_text: need chunk > 0 and 0 <= overlap < chunk, "
                f"got chunk={chunk} overlap={overlap}"
            )
        if not text:  # NULL or empty → no chunks
            return
        stride = chunk - overlap
        idx = 0
        for start in range(0, len(text), stride):
            yield idx, text[start : start + chunk]
            idx += 1


def register_chunk_udtf(spark: SparkSession, name: str = "chunk_text") -> None:
    """Register :class:`ChunkText` for SQL ``LATERAL`` use."""
    spark.udtf.register(name, ChunkText)


def chunk_text_column(text: Column | str, chunk: int, overlap: int) -> Column:
    """Pure-Column twin of :class:`ChunkText`: returns
    ``array<struct<chunk_idx:int, chunk_text:string>>`` (empty array
    for empty/NULL text). Caller explodes; see :func:`chunk_documents`.
    """
    if chunk <= 0 or overlap < 0 or overlap >= chunk:
        raise ValueError(
            f"chunk_text_column: need chunk > 0 and 0 <= overlap < chunk, "
            f"got chunk={chunk} overlap={overlap}"
        )
    t = F.col(text) if isinstance(text, str) else text
    stride = chunk - overlap
    n = F.length(t)
    # starts = 0, stride, … ≤ n-1  (guard n=0/NULL: sequence needs
    # start ≤ stop for a positive step)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            t.substr(s + 1, F.lit(chunk)).alias("chunk_text"),
        ),
    )


def chunk_documents(
    df: DataFrame,
    chunk: int,
    overlap: int,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Hot-path corpus chunking: one narrow projection + explode, no
    shuffle, fuses into the scan. Returns ``id_cols + (chunk_idx,
    chunk_text)`` with zero rows for empty/NULL documents (outer
    explode is deliberately NOT used — parity with the UDTF)."""
    arr = chunk_text_column(F.col(text_col), chunk, overlap)
    return df.select(*id_cols, F.explode(arr).alias("c")).select(
        *id_cols, F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
