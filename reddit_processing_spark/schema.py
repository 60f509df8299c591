"""Schema catalog for the engine (SURVEY.md §1.2).

The input contract (BASELINE.json ``input_hint``) is one table of
multi-turn conversation transcripts with exactly these columns:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Derived tables are declared here so every writer/reader agrees on
types; all ids are deterministic 64-bit hashes (``xxhash64``), never
``monotonically_increasing_id`` (partition-layout-dependent — would
break resume and cross-parallelism equality, SURVEY.md §4.2.6).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Detailed (per-occurrence) edges derived from transcripts.
EDGES = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # 'role' | 'reply'
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("w", T.DoubleType(), False),
    ]
)

# Aggregated (multigraph-collapsed) edges used by the graph algorithms.
EDGES_AGG = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("w", T.DoubleType(), False),
    ]
)

# Vertex dictionary: vid = xxhash64(vtype, '|', vkey).
VERTICES = T.StructType(
    [
        T.StructField("vid", T.LongType(), False),
        T.StructField("vkey", T.StringType(), False),
        T.StructField("vtype", T.StringType(), False),  # 'role'|'user'|'thread'
    ]
)

RANKS = T.StructType(
    [
        T.StructField("vid", T.LongType(), False),
        T.StructField("rank", T.DoubleType(), False),
    ]
)

COMPONENTS = T.StructType(
    [
        T.StructField("vid", T.LongType(), False),
        T.StructField("comp", T.LongType(), False),
    ]
)

LABELS = T.StructType(
    [
        T.StructField("vid", T.LongType(), False),
        T.StructField("label", T.LongType(), False),
    ]
)

TRIANGLES = T.StructType(
    [
        T.StructField("vid", T.LongType(), False),
        T.StructField("tri", T.LongType(), False),
    ]
)

# Driver-provided TPC-H-ish tables (TESTDATA.md / FIXTURES.md §B).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
