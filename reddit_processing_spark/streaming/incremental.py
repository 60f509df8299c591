"""Incremental (Structured Streaming) surface of the engine.

The reference is pure batch; this is the engine's forward-looking
stream path (SURVEY.md §2.10): transcripts arriving as a stream are
deduped within a watermark and turned into the same edge schema the
batch extractor emits, so downstream graph supersteps can consume
micro-batched edge deltas.

Batch/stream parity is the design rule: the per-batch transformation
REUSES the batch operators through ``foreachBatch`` where the
streaming engine's restrictions (no multi-window chains over
streaming frames) would otherwise force divergent logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import TRANSCRIPTS


def read_transcript_stream(
    spark, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_turn_counts(transcripts: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-conversation turn counts over event-time tumbling windows;
    late rows beyond the watermark are dropped by the engine."""
    return (
        transcripts.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
        .groupBy(F.window("ts", "1 hour"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("win_start"),
            "conv_id",
            "n_turns",
        )
    )


def streaming_edges_foreach_batch(
    transcripts_stream: DataFrame, sink_path: str, checkpoint: str, n_users: int = 64
):
    """Micro-batch edge derivation: every trigger runs the BATCH
    ``derive_edges`` on the new rows and appends to the edge sink —
    exactly-once via the streaming checkpoint + idempotent dedup key.
    (``n_users`` must be pinned for a stream — the batch default
    derives it from the data, which would drift across batches.)
    """
    from ..operators.extract import derive_edges

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        edges, _ = derive_edges(batch_df, n_users=n_users)
        edges.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(sink_path)

    return (
        transcripts_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
