"""The reference pipeline's two-phase reorganization, Spark-first.

``snap-stanford/reddit-processing`` reorganizes time-partitioned dump
files into entity-partitioned consolidated outputs with a manual
two-phase pipeline (SURVEY.md §0, [R-HIGH]):

  phase 1 "split": stream each input file, append every record to
  bucket ``hash(user_id) % N`` — a hand-rolled hash partitioner.
  phase 2 "merge": per bucket, group by entity, sort each group
  chronologically, write consolidated per-entity output.

On Spark the ENTIRE pipeline is one declarative statement: a shuffle
write (`repartition(N, key)`) with `sortWithinPartitions` — Catalyst
plans the exchange, Tungsten spills, the cluster scheduler replaces
the process pool. No custom code path exists for the 100 TB case:
the same statement scales by adding executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_to_buckets(
    df: DataFrame,
    key: str | Column,
    num_buckets: int,
    out_path: str | None = None,
) -> DataFrame:
    """Phase 1 (the reference's 'split'): hash-partition by entity key.

    Returns the bucketed frame (with a ``bucket`` column for
    inspection); writes Parquet partitioned-by-bucket when
    ``out_path`` is given — each bucket directory is the analog of the
    reference's ``bucket_<i>.tsv``.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    bucketed = df.withColumn(
        "bucket", F.pmod(F.xxhash64(key_col), F.lit(num_buckets)).cast("int")
    ).repartition(num_buckets, "bucket")
    if out_path is not None:
        bucketed.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
    return bucketed


def merge_consolidate(
    df: DataFrame,
    entity_key: str,
    order_by: list[str],
    num_buckets: int,
    out_path: str | None = None,
) -> DataFrame:
    """Phase 2 (the reference's 'merge'): per-entity chronological
    consolidation = one shuffle + partition-local sort. Rows for the
    same entity are co-located and contiguous in (entity, order) —
    exactly the reference's consolidated per-entity output layout.
    """
    out = df.repartition(num_buckets, entity_key).sortWithinPartitions(
        entity_key, *order_by
    )
    if out_path is not None:
        out.write.mode("overwrite").parquet(out_path)
    return out


def consolidate_as_lists(
    df: DataFrame, entity_key: str, ts_col: str, payload_cols: list[str]
) -> DataFrame:
    """Alternative merge output: one row per entity with its
    chronologically sorted record list (SURVEY.md §2.4 A6
    ``sort_array(collect_list(struct(...)))``). Use only when per-
    entity lists fit in memory — the flat layout above is the scale
    path."""
    struct_cols = [ts_col] + [c for c in payload_cols if c != ts_col]
    return df.groupBy(entity_key).agg(
        F.sort_array(F.collect_list(F.struct(*struct_cols))).alias("records"),
        F.count("*").alias("n_records"),
    )
