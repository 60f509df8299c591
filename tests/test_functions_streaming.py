"""Text functions, multimodal plumbing, split/merge reorganization,
streaming edge derivation, and a known-answer triangle fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.functions import text as TXT
from reddit_processing_spark.functions.multimodal import (
    extract_features,
    fake_decode,
    frame_sample_plan,
    synthetic_media,
)
from reddit_processing_spark.graph.triangles import triangle_count
from reddit_processing_spark.operators.split_merge import (
    consolidate_as_lists,
    merge_consolidate,
    split_to_buckets,
)


def test_text_functions(spark):
    rows = [
        (1, "the cat and the dog, in a house!"),
        (2, "el perro y el gato en la casa"),
        (3, ""),
        (4, "   "),
        (5, "x" * 600),
        (6, "der hund und die katze ist von den"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = df.select(
        "doc_id",
        TXT.token_count("text").alias("tc"),
        TXT.bpe_token_count("text").alias("bc"),
        TXT.lang_id("text").alias("lang"),
        TXT.punct_ratio("text").alias("pr"),
        TXT.quality_score("text").alias("q"),
        TXT.fingerprint("text").alias("fp"),
    ).toPandas().set_index("doc_id")
    assert got.loc[1, "tc"] == 8
    assert got.loc[3, "tc"] == 0 and got.loc[4, "tc"] == 0
    assert got.loc[1, "lang"] == "en"
    assert got.loc[2, "lang"] == "es"
    assert got.loc[6, "lang"] == "de"
    assert got.loc[3, "lang"] == "und"
    assert got.loc[1, "bc"] == 10  # 8 words + comma + bang
    assert 0 < got.loc[1, "pr"] < 0.2
    assert (got["q"] >= 0).all() and (got["q"] <= 1).all()
    # fingerprint: whitespace/case normalization collapses variants
    df2 = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "hello worlds")],
        "doc_id int, text string",
    )
    fps = df2.select(TXT.fingerprint("text").alias("fp")).toPandas()["fp"]
    assert fps[0] == fps[1] != fps[2]


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, n=32)
    feats = extract_features(media).toPandas().sort_values("media_id")
    assert len(feats) == 32
    assert all(len(f) == 8 for f in feats["feature"])
    # deterministic: matches the local decode of the same payload
    m0 = media.filter(F.col("media_id") == 0).collect()[0]
    expect = fake_decode(m0.payload, m0.kind)
    got = np.array(feats.iloc[0]["feature"], dtype=np.float32)
    assert np.allclose(got, expect)
    # frame sampling fan-out is declarative
    frames = frame_sample_plan(media, every_ms=1000).toPandas()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(frames) == n_videos * 4  # 0,1000,2000,3000 ms


def test_split_merge_roundtrip(spark, tiny_dir):
    t = spark.read.parquet(tiny_dir)
    bucketed = split_to_buckets(t, "conv_id", 8)
    assert bucketed.select("bucket").distinct().count() <= 8
    # same key always lands in the same bucket
    assert (
        bucketed.groupBy("conv_id")
        .agg(F.countDistinct("bucket").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )
    merged = merge_consolidate(t, "conv_id", ["turn_idx", "ts"], 8)
    assert merged.count() == t.count()
    lists = consolidate_as_lists(t, "conv_id", "ts", ["ts", "role", "text"])
    row = lists.filter(F.col("conv_id") == "c00000001").collect()[0]
    assert row.n_records == 5
    ts_list = [r.ts for r in row.records]
    assert ts_list == sorted(ts_list)


def test_triangles_known_answer(spark):
    """Non-trivial planted topology (the fixture graph is triangle-free,
    so this pins real counts): K4 plus a pendant edge."""
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in
         [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]],
        "src long, dst long, w double",
    )
    for oriented in (True, False):
        got = {r.vid: r.tri for r in triangle_count(spark, edges, degree_oriented=oriented).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}, f"oriented={oriented}"


def test_streaming_edges_and_counts(spark, tiny_dir, tmp_path):
    from reddit_processing_spark.streaming.incremental import (
        read_transcript_stream,
        streaming_edges_foreach_batch,
        streaming_turn_counts,
    )

    stream = read_transcript_stream(spark, tiny_dir, max_files_per_trigger=1)
    sink = str(tmp_path / "edges")
    q = streaming_edges_foreach_batch(
        stream, sink, str(tmp_path / "ckpt"), n_users=66
    ).start()
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    # batch equivalence: same fixture through the batch extractor
    from reddit_processing_spark.operators.extract import derive_edges

    batch_edges, _ = derive_edges(spark.read.parquet(tiny_dir), n_users=66)
    assert got.count() == batch_edges.count()

    # windowed streaming aggregation with watermark + in-watermark dedup
    stream2 = read_transcript_stream(spark, tiny_dir)
    agg = streaming_turn_counts(stream2)
    q2 = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("turn_counts")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    res = spark.sql("select sum(n_turns) s from turn_counts").collect()[0].s
    # append mode only emits windows the watermark has closed; with a
    # finite file source all windows eventually close except the newest
    assert res is None or res > 0


def test_streaming_session_counts_match_batch_sessionization(spark, tiny_dir, tmp_path):
    """session_window streaming agg == batch gap-based sessionization
    (lag + cumulative session ids), run to completion with availableNow."""
    import os
    import uuid

    from pyspark.sql import Window

    from reddit_processing_spark.streaming.incremental import (
        read_transcript_stream,
        streaming_session_counts,
    )

    stream = read_transcript_stream(spark, os.path.join(tiny_dir, "*.parquet"))
    sess = streaming_session_counts(stream, gap="30 minutes", watermark="0 seconds")
    qname = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.table(qname)
        .groupBy("conv_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_turns").cast("long").alias("n_turns"))
        .toPandas()
        .set_index("conv_id")
    )

    # batch oracle: classic gap sessionization over the same rows
    t = spark.read.parquet(os.path.join(tiny_dir, "*.parquet"))
    w = Window.partitionBy("conv_id").orderBy("ts")
    batch = (
        t.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | (
                    F.col("ts").cast("timestamp").cast("long")
                    - F.col("prev").cast("timestamp").cast("long")
                    >= 30 * 60
                )
            ).cast("long"),
        )
        .groupBy("conv_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").cast("long").alias("n_turns"))
        .toPandas()
        .set_index("conv_id")
    )
    # append mode only emits CLOSED sessions; with watermark delay 0
    # every session closes except those still open at end-of-stream —
    # compare the conversations fully emitted
    for conv in got.index:
        assert got.loc[conv, "n_turns"] <= batch.loc[conv, "n_turns"]
    full = got[got["n_turns"] == batch.loc[got.index, "n_turns"]]
    assert len(full) > 0
    for conv in full.index:
        assert full.loc[conv, "n_sessions"] == batch.loc[conv, "n_sessions"], conv


def test_streaming_edges_replay_idempotent(spark, tiny_dir, tmp_path):
    """foreachBatch is at-least-once: a batch retried after a partial
    write must REPLACE its epoch partition, not append a second copy
    (round-2 VERDICT #2). The processor is invoked twice with the same
    epoch_id — that epoch's edge multiset must be single-copy; a later
    epoch must coexist untouched."""
    from reddit_processing_spark.streaming.incremental import make_edge_batch_processor

    sink = str(tmp_path / "edges_idem")
    src = spark.read.parquet(tiny_dir)
    half = src.filter(F.col("turn_idx") % 2 == 0)
    rest = src.filter(F.col("turn_idx") % 2 == 1)
    process = make_edge_batch_processor(sink, n_users=66)

    process(half, 0)
    epoch0_once = sorted(
        tuple(r) for r in spark.read.parquet(sink).filter(F.col("epoch") == 0)
        .select("src", "dst", "kind", "conv_id", "w").collect()
    )
    process(half, 0)  # injected retry of the SAME epoch
    process(rest, 1)  # a subsequent epoch
    back = spark.read.parquet(sink)
    epoch0_after = sorted(
        tuple(r) for r in back.filter(F.col("epoch") == 0)
        .select("src", "dst", "kind", "conv_id", "w").collect()
    )
    assert epoch0_after == epoch0_once  # exact multiset: replay replaced, not appended
    assert back.filter(F.col("epoch") == 1).count() > 0


def test_multimodal_real_codecs_roundtrip():
    """BMP and WAV codecs round-trip bit-exactly (pure NumPy, no
    media libs) — the decode side of the real multimodal path."""
    import numpy as np

    from reddit_processing_spark.functions.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # odd width → row padding
    assert (decode_bmp(encode_bmp(img)) == img).all()
    s = rng.integers(-30000, 30000, size=1234).astype(np.int16)
    back, rate = decode_wav(encode_wav(s, rate=8000))
    assert rate == 8000 and (back == s).all()


def test_multimodal_real_decode_features(spark):
    """numpy_decode through the Spark mapInPandas plumbing yields the
    statistics NumPy computes directly on the decoded payloads."""
    import numpy as np

    from reddit_processing_spark.functions.multimodal import (
        decode_bmp,
        decode_wav,
        extract_features,
        numpy_decode,
        synthetic_media_real,
    )

    m = synthetic_media_real(spark, 12)
    got = {
        r.media_id: (r.kind, np.array(r.feature))
        for r in extract_features(m, decoder=numpy_decode).collect()
    }
    for row in m.collect():
        kind, feat = got[row.media_id]
        assert kind == row.kind
        if kind == "image":
            img = decode_bmp(bytes(row.payload)).astype(np.float64)
            assert abs(feat[0] - img[..., 0].mean()) < 1e-3
            assert feat[4] == img.shape[0] and feat[5] == img.shape[1]
        elif kind == "audio":
            s, rate = decode_wav(bytes(row.payload))
            x = s.astype(np.float64) / 32768.0
            assert abs(feat[2] - np.sqrt((x * x).mean())) < 1e-5  # RMS
            assert feat[5] == np.float32(rate / 1000.0)
        else:
            assert feat[0] == 3.0  # three frames
            assert feat[7] == np.float32(6 * 8 / 1000.0)
