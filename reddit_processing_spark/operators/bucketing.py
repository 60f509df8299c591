"""Persistent bucketing — exchange-free co-located joins (SURVEY.md
§4.3; the Spark-native form of the reference's hash-bucketed file
layout, but carried as TABLE METADATA so the optimizer can prove
co-partitioning and delete the shuffle).

``repartition(N, key)`` co-locates rows for ONE query plan;
``bucketBy(N, key)`` persists that layout in the catalog, so EVERY
subsequent equi-join or aggregation on the key reads pre-shuffled
data: the join plan has no ``Exchange`` on either side (asserted in
tests against the executed plan). At 100 TB this is the difference
between re-shuffling the full fact table per pipeline run and paying
the shuffle once at ingest — the classic dimension for conversation
transcripts is ``conv_id`` (every per-conversation window/group/join
becomes exchange-free) and for the entity layout ``user_id``.

Requirements Spark enforces and this module encodes: bucketed writes
go through ``saveAsTable`` (the bucket spec lives in the catalog, not
the parquet files — a plain ``.parquet(path)`` write silently loses
it); both join sides need the same bucket count (or a multiple, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``); ``sortBy``
within buckets additionally removes the per-task sort under
sort-merge join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table (external when
    ``path`` is given). One shuffle now; none on any later key join."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    w = w.sortBy(*(sort_cols or keys))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — the bucket spec rides along in the plan, which a
    path read of the same files would NOT carry."""
    return spark.table(name)


def is_shuffle_free(df: DataFrame) -> bool:
    """True when the executed physical plan contains no SHUFFLE
    exchange — the property bucketed joins exist to buy. A
    ``BroadcastExchange`` deliberately does not count: it ships the
    small side, it does not repartition the big one (and it is exactly
    what AQE inserts when a bucketed side is tiny anyway)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return not any(
        marker in plan
        for marker in (
            "Exchange hashpartitioning",
            "Exchange rangepartitioning",
            "Exchange SinglePartition",
        )
    )
