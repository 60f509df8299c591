"""spark-submit job: transcripts → edges →
{cc | cc_star | lpa | triangles | clustering | kcore | hits | bfs | sssp |
 scc | closeness | betweenness | metrics | katz | truss | modularity |
 reciprocity}.

Usage (cluster):
  spark-submit --py-files dist/engine.zip jobs/run_graph.py \
      --algo cc --transcripts <path> --ckpt <dir> --out <dir> \
      [--max-iter 50] [--partitions 64] [--master local[8]]

Prints one JSON line of run metrics (per-superstep walls from the
checkpoint manifests for the iterative algorithms).
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
    p.add_argument(
        "--algo",
        choices=["cc", "cc_star", "lpa", "triangles", "clustering", "kcore",
                 "hits", "bfs", "sssp", "scc", "closeness", "betweenness",
                 "metrics", "katz", "truss", "modularity", "reciprocity"],
        required=True,
    )
    p.add_argument(
        "--alpha", type=float, default=None,
        help="katz only: attenuation (default: 0.5/max-weighted-degree, "
             "a provable spectral-radius bound)",
    )
    p.add_argument(
        "--sources",
        default=None,
        help="bfs only: comma-separated source vids (default: 3 smallest)",
    )
    p.add_argument(
        "--k", type=int, default=16,
        help="closeness/betweenness: number of sampled pivots; "
             "truss: the k of the k-truss (default 16 suits sampling, "
             "pass e.g. --k 4 for trusses)",
    )
    p.add_argument("--transcripts", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--max-iter", type=int, default=50)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    p.add_argument("--n-users", type=int, default=None)
    p.add_argument(
        "--ckpt-every", type=int, default=1,
        help="kcore/bfs/sssp/closeness only: fuse this many supersteps per "
             "checkpointed job (superstep fusion; results are "
             "cadence-independent, resume granularity coarsens to the "
             "block)",
    )
    args = p.parse_args(argv)

    from reddit_processing_spark.graph.components import (
        connected_components,
        connected_components_star,
    )
    from reddit_processing_spark.graph.lpa import label_propagation
    from reddit_processing_spark.graph.triangles import triangle_count
    from reddit_processing_spark.operators.extract import aggregate_edges, derive_edges
    from reddit_processing_spark.plans.ckpt import CheckpointManager
    from reddit_processing_spark.session import get_spark

    spark = get_spark(
        app_name=f"run_{args.algo}",
        master=args.master,
        shuffle_partitions=args.partitions,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    t0 = time.monotonic()
    transcripts = spark.read.parquet(args.transcripts)
    edges, _ = derive_edges(transcripts, n_users=args.n_users)
    agg = aggregate_edges(edges)

    if args.algo == "cc":
        out = connected_components(
            spark, agg, max_iter=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions,
        )
        manifest_algo = "components"
    elif args.algo == "cc_star":
        out = connected_components_star(
            spark, agg, max_rounds=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions,
        )
        manifest_algo = "cc_star"
    elif args.algo == "lpa":
        out = label_propagation(
            spark, agg, max_iter=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions,
        )
        manifest_algo = "lpa"
    elif args.algo == "kcore":
        from reddit_processing_spark.graph.kcore import core_numbers

        out = core_numbers(
            spark, agg, max_iter=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions, ckpt_every=args.ckpt_every,
        )
        manifest_algo = "kcore"
    elif args.algo == "hits":
        from reddit_processing_spark.graph.hits import HITS

        h = HITS(spark, agg, num_partitions=args.partitions)
        out = h.run(max_iter=args.max_iter, ckpt_dir=args.ckpt)
        manifest_algo = "hits"
    elif args.algo == "bfs":
        from pyspark.sql import functions as F

        from reddit_processing_spark.graph.bfs import bfs_distances

        if args.sources:
            vids = [int(v) for v in args.sources.split(",")]
            src_df = spark.createDataFrame([(v,) for v in vids], "vid long")
        else:
            src_df = (
                agg.select(F.col("src").alias("vid"))
                .unionByName(agg.select(F.col("dst").alias("vid")))
                .distinct()
                .orderBy("vid")
                .limit(3)
            )
        out = bfs_distances(
            spark, agg, src_df, max_iter=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions, ckpt_every=args.ckpt_every,
        )
        manifest_algo = "bfs"
    elif args.algo == "sssp":
        from pyspark.sql import functions as F

        from reddit_processing_spark.graph.bfs import shortest_paths

        if args.sources:
            vids = [int(v) for v in args.sources.split(",")]
            src_df = spark.createDataFrame([(v,) for v in vids], "vid long")
        else:
            src_df = (
                agg.select(F.col("src").alias("vid"))
                .unionByName(agg.select(F.col("dst").alias("vid")))
                .distinct()
                .orderBy("vid")
                .limit(3)
            )
        out = shortest_paths(
            spark, agg, src_df, max_iter=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions, ckpt_every=args.ckpt_every,
        )
        manifest_algo = "sssp"
    elif args.algo == "scc":
        from reddit_processing_spark.graph.scc import strongly_connected_components

        out = strongly_connected_components(
            spark, agg, max_outer=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions,
        )
        manifest_algo = "scc"
    elif args.algo == "clustering":
        from reddit_processing_spark.graph.triangles import clustering_coefficients

        out = clustering_coefficients(spark, agg)
        manifest_algo = None
    elif args.algo == "closeness":
        from reddit_processing_spark.graph.closeness import closeness_estimate

        out = closeness_estimate(
            spark, agg, k=args.k, max_iter=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions, ckpt_every=args.ckpt_every,
        )
        manifest_algo = "bfs_per_source"
    elif args.algo == "betweenness":
        from reddit_processing_spark.graph.betweenness import betweenness_estimate

        out = betweenness_estimate(
            spark, agg, k=args.k, max_depth=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions,
        )
        manifest_algo = None  # two phases, fwd/bwd manifests under ckpt subdirs
    elif args.algo == "metrics":
        from reddit_processing_spark.graph.metrics import degree_assortativity

        out = degree_assortativity(spark, agg)
        manifest_algo = None
    elif args.algo == "katz":
        from pyspark.sql import functions as F

        from reddit_processing_spark.graph.katz import Katz

        alpha = args.alpha
        if alpha is None:
            # max weighted out-degree bounds lambda_max; NULL when the
            # edge table is empty (max of nothing) — any alpha works
            # there, Katz short-circuits to the empty result itself
            # (round-4 ADVICE: the bare float(...) raised TypeError).
            smax = (
                agg.groupBy("src").agg(F.sum("w").alias("s"))
                .agg(F.max("s")).collect()[0][0]
            )
            alpha = 0.1 if smax is None else 0.5 / float(smax)
        kz = Katz(spark, agg, num_partitions=args.partitions)
        out = kz.run(alpha=alpha, max_iter=args.max_iter, ckpt_dir=args.ckpt)
        manifest_algo = "katz"
    elif args.algo == "truss":
        from reddit_processing_spark.graph.truss import k_truss

        out = k_truss(
            spark, agg, k=args.k, ckpt_dir=args.ckpt,
            max_rounds=args.max_iter, num_partitions=args.partitions,
        )
        manifest_algo = "truss"
    elif args.algo == "modularity":
        from reddit_processing_spark.graph.lpa import label_propagation as _lpa
        from reddit_processing_spark.graph.metrics import modularity as _mod

        labels = _lpa(
            spark, agg, max_iter=args.max_iter, ckpt_dir=args.ckpt,
            num_partitions=args.partitions,
        )
        out = _mod(spark, agg, labels)
        manifest_algo = "lpa"
    elif args.algo == "reciprocity":
        from reddit_processing_spark.graph.metrics import reciprocity as _rec

        out = _rec(spark, agg)
        manifest_algo = None
    else:
        out = triangle_count(spark, agg)
        manifest_algo = None

    out.write.mode("overwrite").parquet(args.out)
    wall_s = round(time.monotonic() - t0, 3)

    metrics = {
        "algo": args.algo,
        "rows": out.count(),
        "wall_s": wall_s,
        "master": spark.sparkContext.master,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
    }
    if manifest_algo and args.ckpt:
        hist = CheckpointManager(args.ckpt, manifest_algo).metrics_history()
        metrics["supersteps"] = len(hist)
        metrics["per_superstep_wall_ms"] = [h["wall_ms"] for h in hist]
    print(json.dumps(metrics))
    spark.stop()
    return metrics


if __name__ == "__main__":
    main()
