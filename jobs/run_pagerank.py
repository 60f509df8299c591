"""spark-submit job: transcripts → edges → PageRank → ranks parquet.

Usage (cluster):
  spark-submit --py-files dist/engine.zip jobs/run_pagerank.py \
      --transcripts <path> --ckpt <dir> --out <dir> \
      [--tol 1e-6] [--max-iter 100] [--kernel csr] [--salt 1] \
      [--partitions 64] [--master local[8]]

Prints one JSON line of run metrics (per-superstep walls come from
the checkpoint manifests — the per-partition lineage record).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--transcripts", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--kernel", choices=["csr", "sql"], default="csr")
    p.add_argument("--salt", type=int, default=1)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    p.add_argument("--n-users", type=int, default=None)
    p.add_argument(
        "--personalization",
        default=None,
        help="optional parquet of (vid:long, p:double) teleport weights "
        "— personalized PageRank (networkx semantics)",
    )
    args = p.parse_args(argv)

    from reddit_processing_spark.graph.pagerank import PageRank
    from reddit_processing_spark.operators.extract import aggregate_edges, derive_edges
    from reddit_processing_spark.plans.ckpt import CheckpointManager
    from reddit_processing_spark.session import get_spark

    spark = get_spark(
        app_name="run_pagerank",
        master=args.master,
        shuffle_partitions=args.partitions,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    t0 = time.monotonic()
    transcripts = spark.read.parquet(args.transcripts)
    edges, _ = derive_edges(transcripts, n_users=args.n_users)
    agg = aggregate_edges(edges)
    pers = (
        spark.read.parquet(args.personalization) if args.personalization else None
    )
    pr = PageRank(
        spark,
        agg,
        num_partitions=args.partitions,
        salt=args.salt,
        kernel=args.kernel,
        personalization=pers,
    )
    setup_s = time.monotonic() - t0

    t1 = time.monotonic()
    ranks = pr.run(
        d=args.damping, tol=args.tol, max_iter=args.max_iter, ckpt_dir=args.ckpt
    )
    loop_s = time.monotonic() - t1
    ranks.write.mode("overwrite").parquet(args.out)

    ck = CheckpointManager(args.ckpt, "pagerank")
    hist = ck.metrics_history()
    supersteps = len(hist)
    step_wall_s = sum(h["wall_ms"] for h in hist) / 1000.0
    warm = [h["wall_ms"] for h in hist[1:]]
    metrics = {
        "edges": pr.E,
        "vertices": pr.V,
        "supersteps": supersteps,
        "setup_s": round(setup_s, 3),
        "loop_s": round(loop_s, 3),
        "superstep_wall_s": round(step_wall_s, 3),
        "edges_per_sec_per_superstep": round(pr.E * supersteps / max(loop_s, 1e-9), 1),
        # steady-state throughput: first superstep carries one-time JVM
        # JIT + Python-worker pool spin-up; on a long-lived cluster run
        # (10^12 turns, hundreds of supersteps) the warm rate dominates.
        "edges_per_sec_warm": (
            round(pr.E * len(warm) / max(sum(warm) / 1000.0, 1e-9), 1) if warm else None
        ),
        "final_delta": hist[-1].get("delta") if hist else None,
        "master": spark.sparkContext.master,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "kernel": args.kernel,
        "salt": args.salt,
        "per_superstep_wall_ms": [h["wall_ms"] for h in hist],
    }
    pr.unpersist()
    print(json.dumps(metrics))
    spark.stop()
    return metrics


if __name__ == "__main__":
    main()
