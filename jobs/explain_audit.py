"""Plan-quality audit: prints `.explain(formatted)` for representative
queries and asserts the physical properties the 100 TB design relies
on (SURVEY.md §4): parquet filter/column pushdown, whole-stage
codegen on the hot paths, broadcast joins for small dims, and
shuffle-hash (not sort-merge) in the PageRank hot loop.

Writes EXPLAINS.md at the repo root. Usage: python jobs/explain_audit.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

CHECKS = {
    "q5_region_revenue": [
        ("BroadcastHashJoin", "small dims (nation, region) broadcast"),
        ("*(", "whole-stage codegen on the join+agg pipeline (final plan)"),
        ("ReadSchema:", "column pruning reaches the parquet scan"),
    ],
    "q1_pricing_summary": [
        ("PushedFilters:", "shipdate predicate pushed to parquet"),
        ("*(", "whole-stage codegen'd aggregation (final plan)"),
    ],
    "join_range_quantity_buckets": [
        ("BroadcastNestedLoopJoin", "non-equi range join broadcasts the bucket table"),
    ],
    "window_topk_per_customer": [
        ("WindowGroupLimit", "top-k window prunes before full sort (rank pushdown)"),
    ],
    "topk_global_lineitems": [
        ("TakeOrderedAndProject", "global top-k avoids a full sort"),
    ],
    "ann_lsh_suite": [
        ("MapInArrow", "LSH bucketing + IVF assignment (all three legs) are Arrow kernel passes, not inlined literal dot products"),
        ("BroadcastHashJoin", "bucket/cell probes broadcast the (small) query side"),
    ],
    "scan_text_roundtrip": [
        ("Scan csv", "text scan through the CSV datasource with explicit schema"),
        ("Scan json", "NDJSON leg scans through the JSON datasource"),
        ("ReadSchema:", "schema carried into the scan, never inferred"),
    ],
    "sample_splits": [
        ("TakeOrderedAndProject", "exact-n sample leg is per-partition top-n heaps, never a global sort"),
        ("HashAggregate", "split/stratum legs aggregate with map-side partial combine"),
    ],
    "grouped_agg_mad": [
        # Spark 4.x physical node name for a group-aggregate pandas UDF
        ("ArrowAggregatePython", "F4 grouped-agg pandas UDF runs as one Arrow-batched grouped pass"),
    ],
    "map_metrics_blob": [
        ("ObjectHashAggregate", "map_from_arrays built via object hash agg (collect_list), not sort-based fallback"),
    ],
    "set_ops_custkeys": [
        ("HashAggregate", "single-plan union/intersect/except via tag+groupBy (no driver-side counts)"),
    ],
    "linkpred_part_cooccurrence": [
        ("HashAggregate", "wedge groupBy(a,b) aggregates with map-side partial combine"),
        ("ShuffledHashJoin", "degree attach joins are shuffle-hash (|V|-row sides, never blind broadcast)"),
    ],
    "tri_part_cooccurrence": [
        ("BroadcastNestedLoopJoin", "one-row degree-metrics leg attaches via broadcast cross join — no shuffle, no repartition of the triangle side"),
    ],
    "docs_quality_score": [
        ("ReadSchema:", "all five scoring legs prune to (doc_id, text) at the parquet scan"),
        ("*(", "quality/langid/repetition/PII column math is whole-stage codegen'd (no Python on the row path)"),
    ],
    "agg_distinct_per_supplier": [
        ("ObjectHashAggregate", "HLL++/GK sketch buffers aggregate in one object-hash pass alongside the exact twins"),
    ],
    "docs_token_stats": [
        ("ArrowEvalPythonUDTF", "F5 chunking UDTF (LATERAL chunk_text) runs Arrow-batched, not the row-pickled BatchEvalPythonUDTF fallback"),
    ],
}


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def final_plan_of(df) -> str:
    """Execute, then return the AQE-final physical plan string —
    codegen spans (`*(n)` prefixes) and runtime join choices only
    exist there."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    import __spark_entry__ as em
    from reddit_processing_spark.session import get_spark

    spark = get_spark(
        app_name="explain_audit",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sf = "/root/testdata/sf0.01"
    reg = em.queries()
    sections = []
    failures = []
    for name, checks in CHECKS.items():
        df = reg[name](spark, sf)
        plan = plan_of(df)
        if any(n == "*(" for n, _ in checks):
            plan += "\n" + final_plan_of(df)
        results = []
        for needle, why in checks:
            ok = needle in plan
            results.append(f"- {'PASS' if ok else 'FAIL'}: `{needle}` — {why}")
            if not ok:
                failures.append(f"{name}: {needle}")
        # keep reports compact: strip the verbose per-node detail section
        head = plan.split("\n\n")[0]
        sections.append(
            f"## {name}\n\n" + "\n".join(results) + f"\n\n```\n{head}\n```\n"
        )

    # PageRank superstep plan: assert the hot-loop join strategy
    from reddit_processing_spark.graph.pagerank import PageRank
    from reddit_processing_spark.operators.extract import aggregate_edges, derive_edges
    from reddit_processing_spark.sources.fixtures import ensure_fixture, tier_n_users

    t = spark.read.parquet(ensure_fixture("tiny"))
    edges, _ = derive_edges(t, n_users=tier_n_users("tiny"))
    pr = PageRank(spark, aggregate_edges(edges), num_partitions=8, kernel="sql")
    state = pr.vertices.select(
        "vid", F.lit(1.0 / pr.V).alias("rank"), "has_out", F.lit(0.0).alias("dstep")
    )
    plan = plan_of(pr._messages(state))
    results = []
    for needle, why in [
        ("ShuffledHashJoin", "hot-loop rank⋈edges join avoids sort-merge's per-superstep sorts"),
        ("HashAggregate", "map-side partial combine on the dst reduce"),
    ]:
        ok = needle in plan
        results.append(f"- {'PASS' if ok else 'FAIL'}: `{needle}` — {why}")
        if not ok:
            failures.append(f"pagerank_messages: {needle}")
    head = plan.split("\n\n")[0]
    sections.append(
        "## pagerank_messages (sql kernel)\n\n"
        + "\n".join(results)
        + f"\n\n```\n{head}\n```\n"
    )
    pr.unpersist()

    # Katz superstep plan: same hot-loop discipline as PageRank's sql
    # kernel — the persisted edge side must join SHUFFLE_HASH (never
    # sort-merge, never broadcast of a |V|-row state) with a map-side
    # partial combine on the dst reduce.
    from reddit_processing_spark.graph.katz import Katz

    kz = Katz(spark, aggregate_edges(edges), num_partitions=8)
    x0 = kz.vertices.select("vid", F.lit(1.0).alias("x"))
    plan = plan_of(kz._messages(x0))
    results = []
    for needle, why in [
        ("ShuffledHashJoin", "hot-loop state⋈edges join avoids per-superstep sorts"),
        ("HashAggregate", "map-side partial combine on the dst message reduce"),
    ]:
        ok = needle in plan
        results.append(f"- {'PASS' if ok else 'FAIL'}: `{needle}` — {why}")
        if not ok:
            failures.append(f"katz_messages: {needle}")
    head = plan.split("\n\n")[0]
    sections.append(
        "## katz_messages\n\n" + "\n".join(results) + f"\n\n```\n{head}\n```\n"
    )
    kz.unpersist()

    md = (
        "# EXPLAINS — physical-plan audit\n\n"
        "Generated by `python jobs/explain_audit.py` (local[8], sf0.01).\n"
        "Each section asserts the plan properties the design depends on\n"
        "at 100 TB; FAIL lines mean the optimizer stopped picking the\n"
        "intended strategy and the plan needs attention.\n\n"
        + "\n".join(sections)
    )
    with open(os.path.join(REPO, "EXPLAINS.md"), "w") as f:
        f.write(md)
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
