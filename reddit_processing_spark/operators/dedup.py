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
    signature_impl: str = "sql",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    LSH generates candidates (same hash in any band); candidates are
    verified with the EXACT shingle-set Jaccard, so the output has no
    false positives — LSH only affects recall.

    ``signature_impl``: 'sql' (explode + groupBy, one shuffle of the
    exploded shingles — default; measured fastest in local mode) or
    'arrow' (``minhash_signature_arrow``: zero-shuffle vectorized
    kernel — candidate for network-bound clusters; see its docstring
    for the measurement). Banding, candidate join, and exact
    verification are identical either way.
    """
    rows = num_hashes // bands
    if signature_impl == "arrow":
        sigs = minhash_signature_arrow(df, text_col, id_col, num_hashes, k)
    elif signature_impl == "sql":
        sigs = minhash_signature(df, text_col, id_col, num_hashes, k)
    else:
        raise ValueError(f"unknown signature_impl {signature_impl!r}")
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
def ngram_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, gram) inverted index of distinct token n-grams —
    the shared candidate-generation surface of within-corpus Jaccard
    dedup and cross-corpus contamination checks (one definition, so
    the two can never disagree about what a gram is)."""
    toks = ws_tokens(text_col)
    # Build grams by zipping n shifted slices of the token array rather
    # than `transform(sequence(...), i -> slice(toks, i, n))`: the
    # lambda form re-inlines the outer `toks` expression (a split())
    # at EVERY gram position after Catalyst's projection collapse —
    # O(len²) tokenization per doc (same trap as the MinHash H-column
    # form, measured ~20× on this entry). The zip form evaluates the
    # split exactly n times per row.
    m = F.greatest(F.size(toks) - n + 1, F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = F.zip_with(acc, p, lambda a, b: F.concat_ws(" ", a, b))
    grams = F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(acc)
    doc_grams = df.select(
        F.col(id_col).alias("id"), F.array_distinct(grams).alias("grams")
    ).withColumn("n_grams", F.size("grams"))
    return doc_grams.select("id", "n_grams", F.explode("grams").alias("gram"))


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
    index = ngram_index(df, text_col, id_col, n)
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


# -------------------------------------------- cross-corpus contamination
def cross_contamination(
    eval_df: DataFrame,
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """Train/eval decontamination check: for every (eval, train) pair
    sharing at least one token n-gram, the CONTAINMENT of the eval
    document in the train document — |grams(e) ∩ grams(t)| /
    |grams(e)| — the standard directional overlap a training pipeline
    audits before holding a benchmark out (an eval doc fully quoted
    inside a longer train doc scores 1.0, where symmetric Jaccard
    would dilute it).

    Spark shape: both sides index through the SHARED ``ngram_index``
    (one gram definition), candidates come from the inverted-index
    equi-join on gram — never a cross join; ``max_df`` drops grams
    appearing in more than that many TRAIN documents (stopword-gram
    hot keys cannot prove contamination but would dominate the join).
    Returns (eval_id, train_id, inter, containment) for pairs with
    containment ≥ ``threshold``."""
    ev = ngram_index(eval_df, text_col, id_col, n)
    tr = ngram_index(train_df, text_col, id_col, n)
    if max_df is not None:
        rare = tr.groupBy("gram").count().filter(F.col("count") <= max_df)
        tr = tr.join(rare.select("gram"), "gram", "left_semi")
    shared = (
        ev.alias("e")
        .join(tr.alias("t"), "gram")
        .groupBy(
            F.col("e.id").alias("eval_id"),
            F.col("t.id").alias("train_id"),
            F.col("e.n_grams").alias("ne"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        shared.withColumn(
            "containment", (F.col("inter") / F.col("ne")).cast("double")
        )
        .filter(F.col("containment") >= threshold)
        .select("eval_id", "train_id", "inter", "containment")
    )


# ------------------------------------------------- cluster resolution
def resolve_dup_clusters(
    spark,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_partitions: int | None = None,
    ckpt_dir: str | None = None,
) -> DataFrame:
    """The dedup ACTION: turn a near-duplicate PAIR table (from any of
    the candidate generators above — exact, MinHash, SimHash, n-gram)
    into a canonical-document assignment via the transitive closure.

    Near-duplication is not transitive (A~B, B~C does not imply A~C),
    but production dedup treats it as if it were — "cluster and keep
    one" (the MinHash-dedup convention of Lee et al., "Deduplicating
    Training Data Makes Language Models Better") — because keeping
    both endpoints of every broken chain re-admits the middle.
    Clusters are the connected components of the pair graph, computed
    with the engine's hash-min CC (graph/components.py: frontier
    scheduling, salted agg, checkpoint/resume) — the component label
    IS the min doc id, so the canonical document falls out of the
    fixpoint with no extra pass.

    Returns (doc_id, canonical_id, cluster_size, keep) for every
    document that appears in ≥1 pair; docs in no pair are untouched
    by dedup and are deliberately NOT emitted (at 100 TB the pair
    graph is orders of magnitude smaller than the corpus — joining
    the corpus back against this table as a left join / left_anti is
    the caller's cheap final step).
    """
    from ..graph.components import connected_components

    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"),
        F.col(id_b).cast("long").alias("dst"),
    )
    comps = connected_components(
        spark, edges, num_partitions=num_partitions, ckpt_dir=ckpt_dir
    )
    sizes = comps.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return comps.join(sizes, "comp").select(
        F.col("vid").alias("doc_id"),
        F.col("comp").alias("canonical_id"),
        "cluster_size",
        (F.col("vid") == F.col("comp")).alias("keep"),
    )


# ----------------------------------------------- minhash (arrow kernel)
def _splitmix64_np(x):
    import numpy as np

    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def minhash_signature_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 5,
) -> DataFrame:
    """(id, sig:array<long>) — ZERO-SHUFFLE MinHash signatures via one
    vectorized ``mapInArrow`` pass.

    The explode+groupBy formulation (``minhash_signature``) is a
    one-shuffle plan whose shuffle VOLUME is the exploded shingle set
    — ~8 bytes per input character, i.e. ~the corpus size crosses the
    NETWORK once on a real cluster. This kernel computes each
    document's signature entirely within its input partition, trading
    that network shuffle for an Arrow hop of the raw text into the
    Python worker.

    MEASURED (local[32], 250k docs, warm): sql 5.5 s vs arrow 11.2 s —
    in LOCAL mode the "shuffle" is an in-process RAM exchange and the
    codegen'd JVM path wins, so ``sql`` stays the default; the arrow
    path is the option to evaluate on a real cluster where the
    exploded-shingle exchange costs actual network/disk. Recorded per
    the measure-don't-guess rule rather than assumed.

    - all batch texts concatenate into ONE UTF-32 codepoint buffer
      (bulk C conversion, no per-row Python on the char path);
    - k-gram hashes come from a vectorized polynomial rolling hash
      over ``sliding_window_view`` (wrapping uint64, k small);
    - windows crossing document boundaries are masked out via the
      repeat/cumsum doc-index trick;
    - per-hash minima are ``np.minimum.reduceat`` over doc segments
      after mixing the shingle hashes with per-hash splitmix64 seeds.

    Signature VALUES differ from ``minhash_signature`` (different
    64-bit hash family — both deterministic); the downstream contract
    is identical: banded LSH candidates verified with EXACT shingle
    Jaccard, so emitted pairs remain false-positive-free and only
    recall characteristics may differ marginally. Docs with NULL text
    are excluded (same contract as ``minhash_signature``); docs with
    ≤ k chars hash the whole text as their single shingle.
    """
    import numpy as np

    H = num_hashes
    seeds = _splitmix64_np(np.arange(1, H + 1, dtype=np.uint64) * np.uint64(0x9E37))
    B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier, wraps mod 2^64

    def kernel(batches):
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            ids_all = b.column(0).to_numpy(zero_copy_only=False)
            texts = b.column(1).to_pylist()
            keep = np.asarray(
                b.column(1).is_valid().to_numpy(zero_copy_only=False), dtype=bool
            )
            ids = ids_all[keep]
            texts = [t for t in texts if t is not None]
            n = len(texts)
            if n == 0:
                continue
            lens = np.fromiter(map(len, texts), dtype=np.int64, count=n)
            buf = np.frombuffer(
                "".join(texts).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)

            sigs = np.full((n, H), np.iinfo(np.uint64).max, dtype=np.uint64)

            n_win = len(buf) - k + 1
            if n_win > 0:
                # vectorized polynomial rolling hash over all windows
                h = np.zeros(n_win, dtype=np.uint64)
                for j in range(k):
                    h = h * B + buf[j : j + n_win]
                valid = doc_of[:n_win] == doc_of[k - 1 :]
                win_doc = doc_of[:n_win][valid]
                sh = _splitmix64_np(h[valid])
                if len(sh):
                    # segment boundaries per doc (win_doc ascending)
                    seg = np.searchsorted(win_doc, np.arange(n, dtype=np.int64))
                    has = np.zeros(n, dtype=bool)
                    has[win_doc] = True
                    idx = np.flatnonzero(has)
                    for i in range(H):
                        mixed = _splitmix64_np(sh ^ seeds[i])
                        mins = np.minimum.reduceat(mixed, seg[idx])
                        sigs[idx, i] = mins
            # short docs (len <= k, incl. empty → hash of ''): whole
            # text as the single shingle, same polynomial
            short = np.flatnonzero(lens <= k)
            for d in short:
                seg = buf[starts[d] : starts[d] + lens[d]]
                h = np.uint64(0)
                for c in seg:
                    h = h * B + c
                sh1 = _splitmix64_np(np.array([h], dtype=np.uint64))
                sigs[d] = _splitmix64_np(sh1 ^ seeds)

            vals = pa.array(sigs.reshape(-1).view(np.int64), pa.int64())
            offsets = pa.array(
                np.arange(0, (n + 1) * H, H, dtype=np.int32), pa.int32()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64), pa.int64()),
                    pa.ListArray.from_arrays(offsets, vals),
                ],
                ["id", "sig"],
            )

    src = df.select(F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("t"))
    return src.mapInArrow(kernel, "id long, sig array<long>")
