"""In-process smoke of the spark-submit pipeline CLI (jobs/
run_pipeline.py): the dedup stage's cluster-canonical minhash path and
the score stage's PII redaction, chained --out → --in the way a real
run composes them."""

from __future__ import annotations

import importlib.util
import os
import sys


def _cli():
    path = os.path.join(os.path.dirname(__file__), "..", "jobs", "run_pipeline.py")
    spec = importlib.util.spec_from_file_location("run_pipeline_cli", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["run_pipeline_cli"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_dedup_then_score_chain(spark, tmp_path):
    cli = _cli()
    src = "/root/testdata/sf0.001/documents.parquet"
    dd = str(tmp_path / "dedup")
    m1 = cli.main(
        [
            "--stage", "dedup", "--in", src, "--out", dd,
            "--method", "minhash", "--threshold", "0.6", "--partitions", "8",
        ]
    )
    assert 0 < m1["out_rows"] <= m1["in_rows"]
    kept = spark.read.parquet(dd)
    # cluster-canonical: for every verified near-dup pair of KEPT docs
    # there would be a cluster with two keeps — assert none survive
    from reddit_processing_spark.operators.dedup import minhash_lsh_pairs

    assert minhash_lsh_pairs(kept, threshold=0.6).count() == 0

    sc = str(tmp_path / "scored")
    m2 = cli.main(
        [
            "--stage", "score", "--in", dd, "--out", sc,
            "--redact-pii", "--partitions", "8",
        ]
    )
    assert m2["out_rows"] == m1["out_rows"]
    cols = set(spark.read.parquet(sc).columns)
    assert {"n_tokens", "quality", "lang_pred", "text"} <= cols
