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
    ``derive_edges`` on the new rows and writes to the edge sink.

    Idempotent under foreachBatch's at-least-once replay (round-2
    VERDICT #2): the sink is partitioned by ``epoch`` and written with
    mode=overwrite + dynamic partition overwrite, so a batch retried
    after a partial write REPLACES its own epoch partition instead of
    appending the same edges twice — foreachBatch guarantees a stable
    ``epoch_id`` per source offset range, which makes replay
    epoch-exact. (``n_users`` must be pinned for a stream — the batch
    default derives it from the data, which would drift across
    batches.)
    """
    return (
        transcripts_stream.writeStream.foreachBatch(
            make_edge_batch_processor(sink_path, n_users)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def make_edge_batch_processor(sink_path: str, n_users: int = 64):
    """The foreachBatch body of :func:`streaming_edges_foreach_batch`,
    exposed so the replay-idempotence contract is directly testable:
    calling the processor twice with the SAME epoch_id (a foreachBatch
    retry) must leave exactly one copy of that epoch's edges."""
    from ..operators.extract import derive_edges

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        edges, _ = derive_edges(batch_df, n_users=n_users)
        (
            edges.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(sink_path)
        )

    return process


def conversation_state_tracker(
    transcripts: DataFrame,
    watermark: str = "1 hour",
    idle_gap_minutes: int = 120,
) -> DataFrame:
    """Custom stateful streaming operator (SURVEY.md §2.10 /
    BASELINE.json "applyInPandasWithState for custom stateful
    operators"): per-conversation running state with event-time
    session close-out.

    For every conversation the operator maintains (n_turns, first_ts,
    last_ts) across micro-batches and emits an ``open`` update row per
    batch that touches it; when the event-time watermark passes
    ``last_ts + idle_gap_minutes`` the state times out, the
    conversation is emitted once as ``closed`` and its state is freed
    — bounded state for unbounded streams, the semantics Spark's
    built-in windowed aggs can't express (the close-out row carries
    the FULL accumulated lifetime of the conversation, not one
    window's slice).

    The per-batch work is Arrow-batched pandas (no per-row Python):
    each group's rows arrive as pandas DataFrames; state is a tuple of
    scalars.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    idle_us = idle_gap_minutes * 60 * 1_000_000

    def track(key, pdfs, state):
        import pandas as pd

        conv_id = key[0]
        if state.hasTimedOut:
            n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [n],
                    "first_ts": [pd.Timestamp(first_us, unit="us")],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                    "status": ["closed"],
                }
            )
            return
        n, first_us, last_us = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # explicit µs: pandas datetime64 may arrive at ns or µs
            # resolution depending on the Arrow bridge — a bare
            # .astype('int64') would silently be off by 1000x.
            ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            n += len(pdf)
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, first_us, last_us))
        # event-time timeout: fires when the WATERMARK passes this
        # timestamp — i.e. the conversation has been idle for the gap.
        # Clamped: a conversation whose rows arrive when its idle
        # deadline is ALREADY behind the watermark (Spark rejects a
        # timeout <= watermark) closes at the next trigger instead.
        deadline_ms = (last_us + idle_us) // 1000
        state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "status": ["open"],
            }
        )

    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            track,
            outputStructType="conv_id string, n_turns long, first_ts timestamp, "
            "last_ts timestamp, status string",
            stateStructType="n long, first_us long, last_us long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_reply_pairs(
    transcripts: DataFrame,
    reply_minutes: int = 60,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream event-time INTERVAL self-join (SURVEY.md §2.10):
    each arriving turn is paired with every EARLIER turn of the same
    conversation whose timestamp lies within ``reply_minutes`` before
    it — the streaming generalization of the batch lag-extraction (W1)
    from strict adjacency to time-bounded adjacency.

    Spark's stream-stream join rules are satisfied so state is
    bounded: BOTH sides carry an event-time watermark and the join
    condition includes a time-RANGE predicate
    (``prior_ts ∈ [reply_ts − reply_minutes, reply_ts]``), which lets
    the engine drop buffered rows once the watermark passes their
    eligibility horizon. Inner join ⇒ append output; results are
    emitted exactly once per matched pair. Batch parity (same join on
    the static table) is asserted in tests."""
    a = transcripts.select(
        "conv_id",
        F.col("turn_idx").alias("reply_idx"),
        F.col("role").alias("reply_role"),
        F.col("ts").alias("reply_ts"),
    ).withWatermark("reply_ts", watermark)
    b = transcripts.select(
        F.col("conv_id").alias("conv_id_b"),
        F.col("turn_idx").alias("prior_idx"),
        F.col("role").alias("prior_role"),
        F.col("ts").alias("prior_ts"),
    ).withWatermark("prior_ts", watermark)
    # the JOIN condition carries only the equi-key and the time RANGE —
    # that is what the streaming state-constraint extractor parses for
    # buffered-row eviction; the non-time predicate (prior before reply
    # in turn order) applies as a post-join filter, where it costs
    # nothing and cannot confuse state cleanup.
    cond = (
        (F.col("conv_id") == F.col("conv_id_b"))
        & (F.col("prior_ts") <= F.col("reply_ts"))
        & (
            F.col("prior_ts")
            >= F.col("reply_ts") - F.expr(f"interval {int(reply_minutes)} minutes")
        )
    )
    return (
        a.join(b, cond, "inner")
        .filter(F.col("prior_idx") < F.col("reply_idx"))
        .select("conv_id", "prior_idx", "reply_idx", "prior_role", "reply_role")
    )


def streaming_session_counts(
    transcripts: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Event-time SESSION windows (dynamic-gap sessionization, the
    built-in complement to ``conversation_state_tracker``): turns for
    one conversation separated by less than ``gap`` merge into one
    session; a session closes — and emits exactly once (append mode)
    — when the watermark passes its end."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "conv_id",
            "n_turns",
        )
    )
