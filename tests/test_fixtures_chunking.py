"""Chunked fixture generation must be multiset-identical to whole
generation (pure-function-of-(seed,conv,turn) guarantee, FIXTURES.md)."""

from __future__ import annotations

import pandas as pd

from reddit_processing_spark.sources.fixtures import generate_transcripts


def test_chunked_equals_whole():
    whole = generate_transcripts("small")
    parts = pd.concat(
        [generate_transcripts("small", lo, lo + 1700) for lo in range(0, 5000, 1700)],
        ignore_index=True,
    )
    key = ["conv_id", "turn_idx", "ts", "text", "role"]
    a = whole.sort_values(key).reset_index(drop=True)
    b = parts.sort_values(key).reset_index(drop=True)[whole.columns]
    assert len(a) == len(b)
    assert a.equals(b)


def test_duplicate_slot_survives_chunking():
    # the injected duplicate (conv 2, turn 1) must appear exactly once
    # regardless of chunk boundaries
    parts = pd.concat(
        [generate_transcripts("small", lo, lo + 1) for lo in range(0, 5)],
        ignore_index=True,
    )
    dup = parts[(parts.conv_id == "c00000002") & (parts.turn_idx == 1)]
    assert len(dup) == 2  # original + injected duplicate
