"""Custom stateful streaming operator (applyInPandasWithState):
conversation state tracker — running per-conversation counts across
micro-batches, event-time idle close-out, bounded state.

The stream input is the tiny fixture replayed in EVENT-TIME ORDER
split across several files (one file per trigger), so the watermark
genuinely advances between micro-batches and idle conversations time
out mid-stream. The batch groupBy is the oracle.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.streaming.incremental import (
    conversation_state_tracker,
    read_transcript_stream,
)


@pytest.fixture(scope="module")
def ordered_stream_dir(spark, tiny_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("state_stream") / "transcripts")
    df = spark.read.parquet(os.path.join(tiny_dir, "*.parquet"))
    # time-ordered files: repartitionByRange on ts, one file each, so
    # consuming file-by-file replays roughly chronological batches
    df.repartitionByRange(4, "ts").sortWithinPartitions("ts").write.mode(
        "overwrite"
    ).parquet(out)
    # the file stream orders batches by file MTIME — pin mtimes to the
    # range order (part-00000 = lowest ts range) or batch order is a
    # filesystem race and early rows can arrive behind the watermark
    import glob
    import time as _t

    for i, f in enumerate(sorted(glob.glob(os.path.join(out, "part-*.parquet")))):
        os.utime(f, (1_600_000_000 + i * 60, 1_600_000_000 + i * 60))
    _t.sleep(0.01)
    return out


def test_conversation_state_tracker(spark, tiny_dir, ordered_stream_dir, tmp_path):
    stream = read_transcript_stream(spark, ordered_stream_dir, max_files_per_trigger=1)
    tracked = conversation_state_tracker(
        stream, watermark="0 seconds", idle_gap_minutes=30
    )
    qname = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        tracked.writeStream.outputMode("update")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table(qname).toPandas()
    assert len(got) > 0

    batch = (
        spark.read.parquet(os.path.join(tiny_dir, "*.parquet"))
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("conv_id")
    )

    # every conversation's final running count equals the batch count
    final = got.groupby("conv_id")["n_turns"].max()
    for conv, n in final.items():
        assert n == batch.loc[conv, "n"], conv
    assert set(final.index) == set(batch.index)

    closed = got[got.status == "closed"]
    # the fixture spans ~200 hours of event time with a 30-minute idle
    # gap — most conversations MUST close mid-stream...
    assert len(closed) > 0
    # ...exactly once each, with the full accumulated lifetime
    assert closed["conv_id"].is_unique
    for r in closed.itertuples(index=False):
        assert r.n_turns == batch.loc[r.conv_id, "n"]
        assert r.first_ts == batch.loc[r.conv_id, "first_ts"]
        assert r.last_ts == batch.loc[r.conv_id, "last_ts"]
