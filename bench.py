"""BENCH runner (driver contract): runs the engine's headline queries
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: PageRank superstep throughput (edges processed per
second per superstep, BASELINE.json) over the transcript fixture tier
matched to the sf dir; plus wall-clock seconds for representative
relational/dedup/similarity queries over the driver tables.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from reddit_processing_spark.session import get_spark  # noqa: E402
from reddit_processing_spark.sources.fixtures import ensure_fixture  # noqa: E402

BENCH_SUPERSTEPS = 5


def _time(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    tier = "bench" if sf_dir.endswith("0.1") or sf_dir.endswith("0.1/") else "small"
    fixture = ensure_fixture(tier)

    timings: dict[str, float] = {}
    reg = entrymod.queries()
    # Warm-up pass (untimed): first-touch costs — JVM class loading,
    # codegen compilation, parquet footer reads, Python worker spawn —
    # land here instead of inside the first timed query. Standard
    # steady-state benchmarking; per-query numbers then measure the
    # PLAN, not session warm-up.
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).limit(1).count()
    reg["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in (
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_region_revenue",
        "window_topk_per_customer",
        "agg_cube_flag_status",
        "sessionize_events",
        "dedup_minhash_pairs",
        "sim_topk_cosine",
        "tri_part_cooccurrence",
        "embed_near_dup_lsh",
        "ann_lsh_topk",
        "scan_csv_roundtrip",
        "merge_flat_ordering",
    ):
        q = reg[name]
        timings[name] = _time(lambda q=q: q(spark, sf_dir).write.format("noop").mode("overwrite").save())

    # ---- graph headline: PageRank superstep throughput ----
    from reddit_processing_spark.graph.pagerank import PageRank
    from reddit_processing_spark.operators.extract import aggregate_edges, derive_edges

    from reddit_processing_spark.sources.fixtures import tier_n_users

    t = spark.read.parquet(fixture)
    t0 = time.monotonic()
    edges, _ = derive_edges(t, n_users=tier_n_users(tier))
    agg = aggregate_edges(edges).persist()
    agg.count()
    setup_s = round(time.monotonic() - t0, 3)
    timings["derive_edges_setup"] = setup_s

    per_step = {}
    E = 0
    # csr = the north-star Arrow/CSR architecture (headline metric);
    # sql = the pure-JVM shuffle-hash variant, recorded alongside.
    for kernel in ("csr", "sql"):
        pr = PageRank(spark, agg, num_partitions=2 * int(cpus), kernel=kernel)
        E = pr.E
        ck = tempfile.mkdtemp(prefix=f"bench_pr_{kernel}_")
        t1 = time.monotonic()
        pr.run(d=0.85, tol=0.0, max_iter=BENCH_SUPERSTEPS, ckpt_dir=ck)
        loop_s = time.monotonic() - t1
        per_step[kernel] = loop_s / BENCH_SUPERSTEPS
        pr.unpersist()
        timings[f"pagerank_superstep_{kernel}"] = round(per_step[kernel], 3)

    # headline = the engine's best configuration; both kernels are
    # recorded in queries (csr is the north-star Arrow/CSR
    # architecture, sql the pure-JVM shuffle-hash variant — see
    # BENCH/BASELINE.md for the absolute-vs-scaling trade).
    best_kernel = min(per_step, key=per_step.get)
    edges_per_sec = E / per_step[best_kernel]

    # ---- CC evidence, two algorithms ----
    # (a) star CC (large-star/small-star): the production path for
    #     deep graphs — runs to convergence in O(log²) rounds.
    # (b) hash-min frontier-delta (the contract algorithm): 10 capped
    #     supersteps recording the per-superstep message-volume
    #     collapse (this graph's diameter makes full hash-min
    #     convergence an O(diameter)≈hundreds-of-rounds affair — the
    #     exact reason (a) exists; see graph/components.py).
    from reddit_processing_spark.graph.components import (
        connected_components,
        connected_components_star,
    )
    from reddit_processing_spark.plans.ckpt import CheckpointManager

    star_dir = tempfile.mkdtemp(prefix="bench_ccstar_")
    t2 = time.monotonic()
    connected_components_star(
        spark, agg, ckpt_dir=star_dir, num_partitions=2 * int(cpus)
    )
    timings["cc_star_to_convergence"] = round(time.monotonic() - t2, 3)
    star_rounds = len(CheckpointManager(star_dir, "cc_star").metrics_history())

    cc_dir = tempfile.mkdtemp(prefix="bench_cc_")
    t3 = time.monotonic()
    connected_components(
        spark, agg, max_iter=10, ckpt_dir=cc_dir,
        num_partitions=2 * int(cpus), frontier=True,
    )
    timings["cc_delta_10_supersteps"] = round(time.monotonic() - t3, 3)
    cc_hist = CheckpointManager(cc_dir, "components").metrics_history()
    cc_msg_rows = [h.get("msg_rows") for h in cc_hist]

    print(
        json.dumps(
            {
                "metric": "pagerank_edges_per_sec_per_superstep",
                "value": round(edges_per_sec, 1),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "value_kernel": best_kernel,
                "edges": E,
                "supersteps": BENCH_SUPERSTEPS,
                "cpus": int(cpus),
                "fixture_tier": tier,
                "cc_star_rounds": star_rounds,
                "cc_delta_supersteps": len(cc_msg_rows),
                "cc_delta_msg_rows": cc_msg_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
