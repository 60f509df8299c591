"""Dedup + similarity + text-function tests against brute-force
pandas/numpy oracles on the driver documents/embeddings tables plus
planted near-duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from reddit_processing_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from reddit_processing_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dupes,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    """Driver documents + planted exact and near duplicates."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pdf = base.toPandas()
    planted = []
    for i, src in enumerate([3, 7, 11]):
        row = pdf[pdf.doc_id == src].iloc[0]
        planted.append(
            {
                "doc_id": 100000 + i,
                "text": row["text"],  # exact duplicate
                "lang": row["lang"],
                "source": "planted_exact",
                "n_chars": row["n_chars"],
            }
        )
    for i, src in enumerate([5, 9]):
        row = pdf[pdf.doc_id == src].iloc[0]
        planted.append(
            {
                "doc_id": 200000 + i,
                "text": row["text"] + " extra tail",  # near duplicate
                "lang": row["lang"],
                "source": "planted_near",
                "n_chars": row["n_chars"] + 11,
            }
        )
    out = pd.concat([pdf, pd.DataFrame(planted)], ignore_index=True)
    return spark.createDataFrame(out).cache()


def test_exact_dedup(spark, docs):
    groups = exact_dup_groups(docs).toPandas()
    assert len(groups) == 3
    assert sorted(groups["keep_id"]) == [3, 7, 11]
    kept = exact_dedup(docs)
    assert kept.count() == docs.count() - 3
    assert kept.filter(F.col("doc_id").isin(100000, 100001, 100002)).count() == 0


def test_minhash_lsh_finds_planted(spark, docs):
    pairs = minhash_lsh_pairs(docs, threshold=0.6).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    # exact dups have jaccard 1.0 and identical signatures in all bands
    for a, b in [(3, 100000), (7, 100001), (11, 100002)]:
        assert (a, b) in found
    # near dups (tiny tail appended) should also surface
    for a, b in [(5, 200000), (9, 200001)]:
        assert (a, b) in found
    assert (pairs["jaccard"] >= 0.6).all()
    # no false positives: verify every reported pair with pandas jaccard
    pdf = docs.toPandas().set_index("doc_id")["text"]

    def sh(t):
        return {t[i : i + 5] for i in range(max(1, len(t) - 4))}

    for a, b, j in pairs.itertuples(index=False):
        sa, sb = sh(pdf[a]), sh(pdf[b])
        assert abs(len(sa & sb) / len(sa | sb) - j) < 1e-9


def test_simhash_pairs(spark, docs):
    pairs = simhash_pairs(docs, max_hamming=3).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    for a, b in [(3, 100000), (7, 100001), (11, 100002)]:
        assert (a, b) in found and pairs.set_index(["id_a", "id_b"]).loc[(a, b), "hamming"] == 0


def test_ngram_jaccard(spark, docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5).toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    for a, b in [(3, 100000), (7, 100001), (11, 100002)]:
        assert (a, b) in found
    # oracle check of jaccard values
    pdf = docs.toPandas().set_index("doc_id")["text"]

    def grams(t):
        toks = t.split()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for a, b, j in pairs.itertuples(index=False):
        ga, gb = grams(pdf[a]), grams(pdf[b])
        assert abs(len(ga & gb) / len(ga | gb) - j) < 1e-9


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_cosine_topk_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5)
    got = cosine_topk(emb, queries, k=5).toPandas()
    ep = emb.toPandas()
    mat = np.vstack(ep["embedding"].to_numpy())
    ids = ep["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(5):
        qv = mat[ids == qid][0]
        sims = mat @ qv / (norms * np.linalg.norm(qv))
        order = sorted(
            [(s, i) for s, i in zip(sims, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )[:5]
        mine = got[got.query_id == qid].sort_values("rk")
        assert list(mine["vec_id"]) == [i for _, i in order]
        assert np.allclose(mine["sim"].to_numpy(), [s for s, _ in order], atol=1e-6)


def test_cosine_topk_lsh_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries, k=10).toPandas()
    approx = cosine_topk_lsh(emb, queries, k=10, n_planes=5, n_tables=8).toPandas()
    # avg recall@10: with 5 planes x 8 tables a RANDOM candidate set
    # would cover ~22% of points (1-(31/32)^8); sign-LSH must beat that
    # clearly even on these unclustered synthetic embeddings. (Real
    # embedding corpora cluster, where recall is far higher.)
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.35, recalls


def test_embedding_near_dupes_planted(spark, emb):
    ep = emb.toPandas()
    v = np.array(ep.iloc[0]["embedding"], dtype=np.float32)
    jitter = v + np.float32(0.001)
    planted = pd.DataFrame({"vec_id": [900000], "embedding": [jitter.tolist()], "label": [0]})
    df = spark.createDataFrame(pd.concat([ep, planted], ignore_index=True))
    pairs = embedding_near_dupes(df, threshold=0.99).toPandas()
    assert ((pairs.id_a == ep.iloc[0]["vec_id"]) & (pairs.id_b == 900000)).any()


def test_lsh_bucket_table_matches_column_oracle(spark, emb):
    """The production mapInArrow bucketing kernel must be BIT-EXACT vs
    the Column-expression reference (lsh_bucket): same float32
    products, same sequential float64 accumulation — so candidates
    (and therefore pairs/top-k) are identical by construction."""
    from reddit_processing_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket,
        lsh_bucket_table,
    )

    n_planes, n_tables, dim = 8, 6, 64
    got = (
        lsh_bucket_table(emb, "vec_id", "embedding", n_planes, n_tables, dim)
        .toPandas()
        .sort_values(["id", "tbl"])
        .reset_index(drop=True)
    )
    ref_cols = emb.select(
        F.col("vec_id").alias("id"),
        *[
            lsh_bucket(F.col("embedding"), _hyperplanes(dim, n_planes, t)).alias(f"t{t}")
            for t in range(n_tables)
        ],
    ).toPandas()
    ref = ref_cols.melt(id_vars="id", var_name="tbl", value_name="bkt")
    ref["tbl"] = ref["tbl"].str[1:].astype(int)
    ref = ref.sort_values(["id", "tbl"]).reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got["id"].to_numpy() == ref["id"].to_numpy()).all()
    assert (got["tbl"].to_numpy() == ref["tbl"].to_numpy()).all()
    assert (got["bkt"].to_numpy() == ref["bkt"].to_numpy()).all()


def test_minhash_arrow_signature_properties(spark, docs):
    """Zero-shuffle Arrow signature kernel: H mins per doc, null-text
    exclusion, determinism across partitionings (signature is a pure
    per-doc function), and identical-text docs get identical sigs."""
    from reddit_processing_spark.operators.dedup import minhash_signature_arrow

    with_null = docs.unionByName(
        spark.createDataFrame(
            [(900001, None, "en", "null_text", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    s1 = minhash_signature_arrow(with_null, num_hashes=16).toPandas()
    assert 900001 not in set(s1["id"])
    assert (s1["sig"].map(len) == 16).all()
    s2 = (
        minhash_signature_arrow(with_null.repartition(7), num_hashes=16)
        .toPandas()
        .set_index("id")["sig"]
        .map(list)
    )
    s1m = s1.set_index("id")["sig"].map(list)
    assert dict(s1m) == dict(s2)
    # planted exact duplicates share their source's signature
    assert list(s1m[100000]) == list(s1m[3])
    assert list(s1m[100001]) == list(s1m[7])


def test_minhash_lsh_arrow_impl_finds_planted(spark, docs):
    """The arrow signature path drops into the identical banding +
    exact-verify pipeline: planted exact dups at jaccard 1.0, near
    dups found, and every emitted pair's jaccard is the TRUE shingle
    jaccard (no false positives by construction)."""
    pairs = minhash_lsh_pairs(docs, threshold=0.6, signature_impl="arrow").toPandas()
    found = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    for a, b in [(3, 100000), (7, 100001), (11, 100002)]:
        assert (a, b) in found
        assert pairs.set_index(["id_a", "id_b"]).loc[(a, b), "jaccard"] == 1.0
    assert any(a in (5, 9) for a, _ in found)  # near dups

    pdf = docs.toPandas().set_index("doc_id")["text"]

    def sh(t):
        if len(t) <= 5:
            return {t}
        return {t[i : i + 5] for i in range(len(t) - 4)}

    for a, b, j in pairs.itertuples(index=False):
        sa, sb = sh(pdf[a]), sh(pdf[b])
        assert abs(len(sa & sb) / len(sa | sb) - j) < 1e-9


def test_lsh_bucket_table_excludes_null_elements(spark, emb):
    """A vector containing a null ELEMENT gets no bucket in either
    path (round-2 ADVICE): the Column reference yields a NULL bucket
    (null dot product), and the Arrow kernel must not give the row a
    definite bucket by silently NaN-ing the element."""
    from reddit_processing_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket,
        lsh_bucket_table,
    )

    dim = 64
    bad_vec = [0.5] * dim
    bad_vec[7] = None
    bad = spark.createDataFrame(
        [(777777, bad_vec)], "vec_id long, embedding array<float>"
    )
    df = emb.select("vec_id", "embedding").unionByName(bad)
    got = lsh_bucket_table(df, "vec_id", "embedding", 4, 2, dim).toPandas()
    assert (got["id"] == 777777).sum() == 0          # excluded from candidates
    assert (got["id"] != 777777).sum() > 0           # others still bucketed
    ref = bad.select(
        lsh_bucket(F.col("embedding"), _hyperplanes(dim, 4, 0)).alias("bkt")
    ).collect()[0]["bkt"]
    assert ref is None                               # Column oracle agrees: no bucket


def test_cross_contamination_planted(spark):
    """An eval doc fully quoted inside a longer train doc scores
    containment 1.0 (directional — symmetric Jaccard would dilute it);
    unrelated docs produce no pair at the threshold."""
    from reddit_processing_spark.operators.dedup import cross_contamination

    quoted = "the quick brown fox jumps over the lazy dog tonight"
    train = spark.createDataFrame(
        [
            (0, f"header text then {quoted} and a long trailing explanation follows here"),
            (2, "completely unrelated content about sparkplugs and manifolds today"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1, quoted), (3, "nothing in common with anything at all whatsoever")],
        "doc_id long, text string",
    )
    got = {
        (r.eval_id, r.train_id): (r.inter, r.containment)
        for r in cross_contamination(ev, train, n=3, threshold=0.5).collect()
    }
    assert set(got) == {(1, 0)}
    inter, cont = got[(1, 0)]
    assert cont == 1.0  # every 3-gram of the eval doc appears in train
    assert inter == len(quoted.split()) - 2


def test_cross_contamination_matches_pandas_oracle(spark):
    """Exact (eval, train, inter, containment) parity vs a pure-python
    n-gram set oracle on the sf0.001 documents split odd/even."""
    from reddit_processing_spark.operators.dedup import cross_contamination

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    pdf = d.toPandas()

    def grams(t):
        toks = (t or "").strip().split()
        if not toks:
            return {""}
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    g = {r.doc_id: grams(r.text) for r in pdf.itertuples()}
    want = {}
    for e in g:
        if e % 2 != 1:
            continue
        for t in g:
            if t % 2 != 0:
                continue
            inter = len(g[e] & g[t])
            if inter and inter / len(g[e]) >= 0.3:
                want[(e, t)] = (inter, round(inter / len(g[e]), 9))
    ev = d.filter(F.col("doc_id") % 2 == 1)
    tr = d.filter(F.col("doc_id") % 2 == 0)
    got = {
        (r.eval_id, r.train_id): (r.inter, round(r.containment, 9))
        for r in cross_contamination(ev, tr, n=3, threshold=0.3).collect()
    }
    assert got == want


def test_resolve_dup_clusters_chain(spark, tmp_path):
    """Transitive chains collapse to one cluster with canonical = min
    id; disjoint pairs stay separate; singletons are not emitted."""
    from reddit_processing_spark.operators.dedup import resolve_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 6), (7, 5)],
        "id_a long, id_b long",
    )
    got = {
        r.doc_id: (r.canonical_id, r.cluster_size, r.keep)
        for r in resolve_dup_clusters(
            spark, pairs, ckpt_dir=str(tmp_path / "ck")
        ).collect()
    }
    assert got == {
        1: (1, 4, True), 2: (1, 4, False), 3: (1, 4, False), 9: (1, 4, False),
        5: (5, 3, True), 6: (5, 3, False), 7: (5, 3, False),
    }


def test_resolve_dup_clusters_matches_union_find(spark, tmp_path):
    """Exact parity vs a pure-python union-find on the sf0.001 n-gram
    jaccard pair graph (the same composition the driver entry runs)."""
    from reddit_processing_spark.operators.dedup import (
        ngram_jaccard_pairs,
        resolve_dup_clusters,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5)
    rows = pairs.select("id_a", "id_b").collect()

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_canon = {x: find(x) for x in parent}
    from collections import Counter

    sizes = Counter(want_canon.values())
    got = {
        r.doc_id: (r.canonical_id, r.cluster_size, r.keep)
        for r in resolve_dup_clusters(
            spark, pairs, ckpt_dir=str(tmp_path / "ck2")
        ).collect()
    }
    want = {
        x: (c, sizes[c], x == c) for x, c in want_canon.items()
    }
    assert got == want
    assert len(got) > 0  # the tier plants near-dupes; non-vacuous
