"""Exact BPE tokenization (functions/bpe.py): trainer determinism,
fast-encoder ≡ reference-apply parity, Arrow-UDF ≡ pure-python counts,
and a drift envelope vs the regex approximation it replaces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.functions.bpe import (
    bpe_token_count_exact,
    encode_word,
    encode_word_reference,
    load_merges,
    save_merges,
    train_bpe_merges,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "lower lowest newer newest wider widest",
    "low low low low lower lower newest newest newest",
    "a banana bandana and an anaconda",
]


@pytest.fixture(scope="module")
def merges():
    return train_bpe_merges(CORPUS, n_merges=64)


def test_trainer_is_deterministic(merges):
    again = train_bpe_merges(list(CORPUS), n_merges=64)
    assert merges == again
    assert len(merges) > 10  # the corpus supports real merges
    # every merge was learnable: both parts are chars or earlier merges
    known = set("abcdefghijklmnopqrstuvwxyz") | {"</w>"}
    for a, b in merges:
        assert set(a) <= set("abcdefghijklmnopqrstuvwxyz</w>")
        known.add(a + b)


def test_fast_encoder_matches_reference_apply(merges):
    """Rank-based lowest-first merging ≡ applying the merge list in
    training order (the published Sennrich apply) — token for token,
    including words with characters never seen in training."""
    words = sorted({w for t in CORPUS for w in t.split()})
    words += ["unseen", "zzzz", "lowestest", "x", "antidisestablishment"]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words:
        assert encode_word(w, ranks) == encode_word_reference(w, merges), w


def test_roundtrip_and_checked_in_table(tmp_path, merges):
    p = str(tmp_path / "m.txt")
    save_merges(merges, p)
    assert load_merges(p) == merges
    # the checked-in table (trained by jobs/train_bpe.py on the
    # deterministic synthetic documents corpus) loads and is non-empty
    packaged = load_merges()
    assert len(packaged) > 50
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in packaged)


def test_udf_counts_match_pure_python(spark, merges):
    """The Arrow-batched UDF returns exactly Σ_words |encode(word)|,
    NULL for NULL text, 0 for blank text."""
    rows = [(i, t) for i, t in enumerate(CORPUS)] + [(90, None), (91, "   ")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.n
        for r in df.select(
            "id", bpe_token_count_exact("text", merges).alias("n")
        ).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(CORPUS):
        want = sum(len(encode_word(w, ranks)) for w in t.split())
        assert got[i] == want, i
    assert got[90] is None
    assert got[91] == 0


def test_drift_envelope_vs_regex_approximation(spark):
    """The exact count and the regex proxy (functions/text.py) must
    stay within a bounded ratio on the documents table — the proxy
    remains a sane budgeting fallback, and the exact count obeys the
    structural bounds (≥ word count: BPE never merges across words;
    ≤ chars + words: merging only shrinks the character segmentation)."""
    from reddit_processing_spark.functions.text import bpe_token_count, token_count

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = (
        d.select(
            bpe_token_count_exact("text").alias("exact"),
            bpe_token_count("text").alias("approx"),
            token_count("text").alias("words"),
            F.length(F.col("text")).alias("chars"),
        )
        .where(F.col("words") > 0)
        .select(
            (F.col("exact") / F.col("approx")).alias("ratio"),
            (F.col("exact") >= F.col("words")).alias("ge_words"),
            (F.col("exact") <= F.col("chars") + F.col("words")).alias("le_chars"),
        )
        .agg(
            F.min("ratio").alias("rmin"),
            F.max("ratio").alias("rmax"),
            F.avg("ratio").alias("rmean"),
            F.min(F.col("ge_words").cast("int")).alias("all_ge"),
            F.min(F.col("le_chars").cast("int")).alias("all_le"),
        )
        .first()
    )
    assert stats.all_ge == 1 and stats.all_le == 1
    assert 0.25 <= stats.rmin and stats.rmax <= 4.0
    assert 0.5 <= stats.rmean <= 2.5
