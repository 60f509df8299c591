"""spark-submit job: the training-data pipeline stages as a CLI —
dedup, quality scoring, sampling/splitting, and ANN indexing over a
documents/embeddings parquet directory.

Usage (cluster):
  spark-submit --py-files dist/engine.zip jobs/run_pipeline.py \
      --stage dedup    --in <docs.parquet>  --out <dir> [--method minhash]
                       (minhash drops to the cluster-canonical min id
                        via resolve_dup_clusters, not per-pair)
      --stage score    --in <docs.parquet>  --out <dir> [--redact-pii]
      --stage sample   --in <any.parquet>   --out <dir> --key <col> \
                       [--splits train=0.9,val=0.05,test=0.05]
      --stage ann      --in <emb.parquet>   --out <index_dir> \
                       [--n-cells 256] [--id-col vec_id] [--vec-col embedding]
      --stage pack     --in <docs.parquet>  --out <dir> [--capacity 4096]
      --stage decontam --in <eval.parquet>  --train <train.parquet> \
                       --out <dir> [--threshold 0.5]

Each stage prints one JSON line of run metrics. Stages compose by
chaining --out → --in (dedup's kept set feeds score; score's filtered
set feeds sample), mirroring how the same operators compose in-process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_splits(s: str) -> dict[str, float]:
    out = {}
    for part in s.split(","):
        name, frac = part.split("=")
        out[name.strip()] = float(frac)
    return out


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument(
        "--stage",
        choices=["dedup", "score", "sample", "ann", "pack", "decontam"],
        required=True,
    )
    p.add_argument("--in", dest="inp", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--partitions", type=int, default=None)
    # dedup
    p.add_argument("--method", choices=["exact", "minhash"], default="exact")
    p.add_argument("--threshold", type=float, default=0.8)
    # score
    p.add_argument("--min-quality", type=float, default=None)
    p.add_argument("--max-dup-line", type=float, default=None)
    p.add_argument("--redact-pii", action="store_true")
    # sample
    p.add_argument("--key", default="doc_id")
    p.add_argument("--splits", default="train=0.9,val=0.05,test=0.05")
    p.add_argument("--salt", type=int, default=0)
    # pack
    p.add_argument("--capacity", type=int, default=4096)
    # decontam
    p.add_argument("--train", default=None)
    # ann
    p.add_argument("--n-cells", type=int, default=256)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from reddit_processing_spark.session import get_spark

    spark = get_spark(
        app_name=f"pipeline_{args.stage}",
        master=args.master,
        shuffle_partitions=args.partitions,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    t0 = time.monotonic()
    df = spark.read.parquet(args.inp)
    in_rows = df.count()
    metrics: dict = {"stage": args.stage, "in_rows": in_rows}

    if args.stage == "dedup":
        import tempfile

        from reddit_processing_spark.operators.dedup import (
            exact_dedup,
            minhash_lsh_pairs,
            resolve_dup_clusters,
        )

        kept = exact_dedup(df)
        if args.method == "minhash":
            # cluster-canonical semantics (keep min id per transitive
            # cluster), not per-pair drops: per-pair "drop id_b" keeps
            # BOTH outer docs of a chain A~B~C even though the cluster
            # convention retires everything but A
            pairs = minhash_lsh_pairs(kept, threshold=args.threshold)
            clusters = resolve_dup_clusters(
                spark, pairs, ckpt_dir=tempfile.mkdtemp(prefix="dedup_cc_")
            )
            drop = clusters.filter(~F.col("keep")).select("doc_id")
            kept = kept.join(drop, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(args.out)
        metrics["method"] = args.method

    elif args.stage == "score":
        from reddit_processing_spark.functions.text import (
            dup_line_fraction,
            lang_id,
            quality_score,
            redact_pii,
            token_count,
            top_bigram_fraction,
        )

        scored = df.select(
            "*",
            token_count("text").alias("n_tokens"),
            quality_score("text").alias("quality"),
            lang_id("text").alias("lang_pred"),
            dup_line_fraction("text").alias("dup_line_frac"),
            top_bigram_fraction("text").alias("top_bigram_frac"),
        )
        if args.min_quality is not None:
            scored = scored.filter(F.col("quality") >= args.min_quality)
        if args.max_dup_line is not None:
            scored = scored.filter(F.col("dup_line_frac") <= args.max_dup_line)
        if args.redact_pii:
            # scoring ran on the raw text; the emitted text is scrubbed
            scored = scored.withColumn("text", redact_pii("text"))
        scored.write.mode("overwrite").parquet(args.out)

    elif args.stage == "sample":
        from reddit_processing_spark.operators.sampling import hash_split

        splits = _parse_splits(args.splits)
        out = hash_split(df, args.key, splits, salt=args.salt)
        # one directory per split: partition-pruned consumption downstream
        out.write.mode("overwrite").partitionBy("split").parquet(args.out)
        metrics["splits"] = splits

    elif args.stage == "pack":
        from reddit_processing_spark.functions.text import bpe_token_count
        from reddit_processing_spark.operators.packing import pack_sequences

        tok = df.select(args.key, bpe_token_count("text").alias("n_tok"))
        packed = pack_sequences(tok, args.capacity, "n_tok", id_col=args.key)
        packed.write.mode("overwrite").parquet(args.out)
        metrics["capacity"] = args.capacity

    elif args.stage == "decontam":
        from reddit_processing_spark.operators.dedup import cross_contamination

        if not args.train:
            raise SystemExit("--stage decontam requires --train <train.parquet>")
        train = spark.read.parquet(args.train)
        hits = cross_contamination(
            df, train, id_col=args.key, threshold=args.threshold
        )
        hits.write.mode("overwrite").parquet(args.out)
        metrics["train"] = args.train

    else:  # ann
        from reddit_processing_spark.operators.ivf import build_ivf_index

        build_ivf_index(
            df, args.out, n_cells=args.n_cells, dim=args.dim,
            id_col=args.id_col, vec_col=args.vec_col,
        )
        metrics["n_cells"] = args.n_cells

    out_rows = spark.read.parquet(
        os.path.join(args.out, "cells") if args.stage == "ann" else args.out
    ).count()
    metrics.update(
        {
            "out_rows": out_rows,
            "wall_s": round(time.monotonic() - t0, 3),
            "master": spark.sparkContext.master,
        }
    )
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    # stop only in script mode: main() may be driven in-process (tests,
    # notebooks) against a shared session that outlives this stage
    main()
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
