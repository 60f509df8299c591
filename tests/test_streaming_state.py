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


def test_conversation_state_tracker_restart_recovery(
    spark, tiny_dir, ordered_stream_dir, tmp_path
):
    """Mid-stream kill/restart (round-3 VERDICT #7): run the tracker
    over the first half of the time-ordered files, stop, then restart
    from the SAME checkpoint with the rest of the files. The state
    store must recover (running counts continue, not restart), the
    persisted watermark must hold (no duplicate close-outs), and
    conversations closed before the kill must NOT be re-emitted after
    the restart."""
    import glob
    import shutil

    src = sorted(glob.glob(os.path.join(ordered_stream_dir, "part-*.parquet")))
    assert len(src) == 4
    stream_dir = str(tmp_path / "transcripts")
    os.makedirs(stream_dir)
    ck = str(tmp_path / "ck")

    def run_phase(out_dir: str):
        # foreachBatch -> parquet: the memory sink does NOT support
        # checkpoint recovery (Spark refuses to restart from its
        # offsets), and a restartable sink is the whole point here.
        stream = read_transcript_stream(
            spark, stream_dir, max_files_per_trigger=1
        )
        tracked = conversation_state_tracker(
            stream, watermark="0 seconds", idle_gap_minutes=30
        )

        def sink(batch_df, epoch_id):
            if not batch_df.isEmpty():
                batch_df.write.mode("append").parquet(out_dir)

        q = (
            tracked.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out_dir).toPandas()

    for f in src[:2]:
        shutil.copy2(f, stream_dir)  # copy2: keep the pinned mtimes
    p1 = run_phase(str(tmp_path / "out_p1"))
    for f in src[2:]:
        shutil.copy2(f, stream_dir)
    p2 = run_phase(str(tmp_path / "out_p2"))

    import pandas as pd

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
    both = pd.concat([p1, p2], ignore_index=True)

    # the kill/restart seam must be invisible in the final state:
    # running counts CONTINUED across the restart (state recovery, not
    # a from-zero restart)
    final = both.groupby("conv_id")["n_turns"].max()
    assert set(final.index) == set(batch.index)
    for conv, n in final.items():
        assert n == batch.loc[conv, "n"], conv

    # close-outs: exactly once across BOTH phases, full lifetime
    closed = both[both.status == "closed"]
    assert len(closed) > 0
    assert closed["conv_id"].is_unique
    for r in closed.itertuples(index=False):
        assert r.n_turns == batch.loc[r.conv_id, "n"]
        assert r.first_ts == batch.loc[r.conv_id, "first_ts"]
        assert r.last_ts == batch.loc[r.conv_id, "last_ts"]

    # conversations closed BEFORE the kill are fully retired: the
    # restarted query must not emit them again in any status
    closed_p1 = set(p1[p1.status == "closed"]["conv_id"])
    assert len(closed_p1) > 0, "split produced no pre-kill close-outs"
    assert closed_p1.isdisjoint(set(p2["conv_id"]))
