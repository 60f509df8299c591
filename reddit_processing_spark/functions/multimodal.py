"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves
are STUBBED — the sandbox image/audio libraries are absent — behind
``decoder=`` hooks with a deterministic fake for tests; the Spark-side
plumbing (schema, batching, partition sizing) is real and tested.

Scale notes: media rows are orders of magnitude wider than text rows —
``repartition`` by size budget before the UDF stage so one Arrow batch
stays within worker memory, and keep metadata in columns (not inside
the blob) so Catalyst can prune/filter WITHOUT touching bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 8 floats derived from
    the payload bytes. Replace with PIL/librosa/ffmpeg on a real
    cluster — only this function changes; the Spark plumbing stays."""
    if payload is None or len(payload) == 0:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float32), 8)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
    batch_rows: int = 256,
) -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    The iterator-of-batches shape means one task never materializes
    its whole partition; ``spark.sql.execution.arrow.maxRecordsPerBatch``
    (set here per-plan via repartitioning guidance) bounds batch RAM.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p, k).astype(np.float32).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: expands each video row into frame
    timestamps JVM-side (sequence+explode); the actual frame decode is
    the stubbed kernel above. Demonstrates fan-out stays declarative."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "payload")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = repeatable
    byte pattern)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(((i * 37 + j * 11) % 251 for j in range(64 + (i % 5) * 32)))
        rows.append(
            (
                i,
                kind,
                f"x/{kind}",
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                3000 if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
