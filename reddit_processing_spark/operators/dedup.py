"""Document deduplication for large-scale training-data pipelines.

Four families, all expressed as declarative DataFrame programs (the
only Python is driver-side plan construction — every row-path
operation is a built-in Column expression, JVM-side):

- exact          : hash-groupBy on a normalized fingerprint.
- MinHash + LSH  : char-shingles → per-shingle xxhash64 → H min-hash
                   signature → banded bucket join → candidate pairs →
                   EXACT Jaccard verification (array_intersect/union).
- SimHash        : token-hash bit-voting → 64-bit sketch → banded
                   hamming candidate join → bit_count(xor) verify.
- n-gram Jaccard : token n-grams → inverted-index self-join →
                   |∩| / |∪| from shared-gram counts.

Scale notes: every self-join here is blocked (LSH band, simhash band,
shared n-gram) — never an O(N²) cross join. Candidate verification is
pushed AFTER the blocking join so the quadratic term only touches
near-duplicate clusters. Skewed blocks (a shingle shared by millions
of docs — stopword-grams) are the classic hot-key hazard: the n-gram
index drops grams with document frequency above ``max_df`` exactly
like a text index drops stopwords.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, shingle_hashes, ws_tokens


# ---------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-text group."""
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fp, n_docs, keep_id) for every group with >1 member."""
    return (
        df.groupBy(fingerprint(text_col).alias("fp"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


# ------------------------------------------------------------- minhash
def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 5,
) -> DataFrame:
    """(id, sig:array<long>) — sig[i] = min over shingles of
    xxhash64(i, shingle_hash).

    Shape matters at scale: shingles are EXPLODED once and the H mins
    are grouped aggregates (map-side partial combine, one shuffle).
    The tempting alternative — H ``array_min(transform(shingles,...))``
    columns — re-inlines the shingle expression H times after
    Catalyst's projection collapse, multiplying the substring/hash work
    by H (measured 20x slower at 5k docs).

    Null contract (explicit, round-1 ADVICE): documents whose text is
    NULL have no shingles and therefore NO signature row — they are
    EXCLUDED from MinHash/LSH by definition (a null document cannot be
    a near-duplicate of anything; exact_dedup still sees it). The
    filter below makes the exclusion deliberate rather than an
    artifact of explode()."""
    sh = shingle_hashes(text_col, k)
    exploded = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.explode(sh).alias("s")
    )
    return exploded.groupBy("id").agg(
        F.array(
            *[F.min(F.xxhash64(F.lit(i), F.col("s"))) for i in range(num_hashes)]
        ).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    LSH generates candidates (same hash in any band); candidates are
    verified with the EXACT shingle-set Jaccard, so the output has no
    false positives — LSH only affects recall.
    """
    rows = num_hashes // bands
    sigs = minhash_signature(df, text_col, id_col, num_hashes, k)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.concat_ws(",", *[F.element_at("sig", b * rows + r + 1) for r in range(rows)])).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bh"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col).alias("id"), shingle_hashes(text_col, k).alias("shingles")
    )
    return (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.col("jaccard").cast("double").alias("jaccard"))
    )


# ------------------------------------------------------------- simhash
def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """(id, simhash:long) — classic bit-voting sketch over whitespace
    tokens, computed with explode + per-bit conditional sums (pure
    JVM aggregation; no UDF)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(ws_tokens(text_col)).alias("tok"),
    ).withColumn("th", F.xxhash64("tok"))
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("tok").isNull(), 0).otherwise(
                    F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) * 2 - 1
                )
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sketch = votes.select(
        "id",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * F.lit(2**b if b < 63 else -(2**63))).otherwise(F.lit(0).cast("long"))
                for b in range(bits)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sketch


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by simhash hamming distance <= max_hamming.

    Pigeonhole blocking: with ``bands`` disjoint bit-chunks, any pair
    within hamming distance < bands shares at least one identical
    chunk — candidates come from per-chunk equi-joins, verified with
    bit_count(xor)."""
    sk = simhash(df, text_col, id_col)
    width = 64 // bands
    chunks = sk.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.chunk")
    cand = (
        chunks.alias("l")
        .join(chunks.alias("r"), ["band", "chunk"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# -------------------------------------------------------- ngram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact token-n-gram Jaccard similarity for every pair sharing at
    least one n-gram (inverted-index join — never a cross join).

    ``max_df`` drops grams appearing in more documents (hot keys /
    stopword-grams) — they cannot decide near-duplication but would
    dominate the join.
    """
    toks = ws_tokens(text_col)
    grams = F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    doc_grams = df.select(
        F.col(id_col).alias("id"), F.array_distinct(grams).alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    index = doc_grams.select("id", "n_grams", F.explode("grams").alias("gram"))
    if max_df is not None:
        rare = index.groupBy("gram").count().filter(F.col("count") <= max_df)
        index = index.join(rare.select("gram"), "gram", "left_semi")
    shared = (
        index.alias("l")
        .join(index.alias("r"), "gram")
        .filter(F.col("l.id") < F.col("r.id"))
        .groupBy(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.n_grams").alias("na"),
            F.col("r.n_grams").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        shared.withColumn(
            "jaccard",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
