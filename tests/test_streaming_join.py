"""Stream-stream event-time interval self-join: the streaming reply
pairs must equal the identical join run as a BATCH query on the same
static table (exact pair-set parity), and emit exactly once (append
mode, no duplicates)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from reddit_processing_spark.streaming.incremental import (
    read_transcript_stream,
    streaming_reply_pairs,
)


def _batch_reply_pairs(df, reply_minutes=60):
    a = df.select(
        "conv_id",
        F.col("turn_idx").alias("reply_idx"),
        F.col("role").alias("reply_role"),
        F.col("ts").alias("reply_ts"),
    )
    b = df.select(
        F.col("conv_id").alias("conv_id_b"),
        F.col("turn_idx").alias("prior_idx"),
        F.col("role").alias("prior_role"),
        F.col("ts").alias("prior_ts"),
    )
    cond = (
        (F.col("conv_id") == F.col("conv_id_b"))
        & (F.col("prior_idx") < F.col("reply_idx"))
        & (F.col("prior_ts") <= F.col("reply_ts"))
        & (
            F.col("prior_ts")
            >= F.col("reply_ts") - F.expr(f"interval {reply_minutes} minutes")
        )
    )
    return a.join(b, cond, "inner").select(
        "conv_id", "prior_idx", "reply_idx", "prior_role", "reply_role"
    )


def test_stream_stream_interval_join_matches_batch(spark, tiny_dir, tmp_path):
    stream = read_transcript_stream(spark, tiny_dir)
    pairs = streaming_reply_pairs(stream, reply_minutes=60, watermark="0 seconds")
    qname = f"reply_pairs_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(qname).toPandas()
    want = _batch_reply_pairs(spark.read.parquet(tiny_dir), 60).toPandas()
    key = ["conv_id", "prior_idx", "reply_idx"]
    g = set(map(tuple, got[key].itertuples(index=False)))
    w = set(map(tuple, want[key].itertuples(index=False)))
    assert len(want) > 0              # the fixture produces real pairs
    assert g == w                     # exact pair-set parity
    # exactly-once: row-for-row multiset parity with the batch join
    # (the fixture plants duplicate turns, so duplicate PAIRS are
    # legitimate — they must appear the same number of times, not once)
    assert len(got) == len(want)
    gk = got.groupby(key).size().sort_index()
    wk = want.groupby(key).size().sort_index()
    assert gk.equals(wk)
