"""Sequence packing for training-batch preparation (SURVEY.md §2.12
family: the step between a scored/deduped corpus and a trainer) —
concat-and-chunk: documents are laid out in a deterministic total
order into one token stream, the stream is cut into fixed-``capacity``
context windows ("packs"), and each document is tagged with the pack
its first token lands in, its offset there, and whether it straddles
a pack boundary. The per-pack fill statistics this induces are what a
data-loading team actually audits (padding waste, straddle rate).

The core primitive is a DISTRIBUTED PREFIX SUM — and the naive Spark
spelling (`sum().over(Window.orderBy(id))` with no partitionBy) is a
100 TB trap: an unpartitioned window collapses the whole table into
ONE task (`Exchange SinglePartition` in the plan). Instead:

1. ``repartitionByRange(P, id)`` — global order preserved ACROSS
   partitions, parallel within; pinned with a localCheckpoint so the
   two passes below see identical partition assignment;
2. per-partition exclusive running sum (window partitioned by the
   physical partition id — parallel);
3. per-partition totals (P tiny rows) → exclusive prefix offsets on
   the driver → broadcast join back.

Total cost: one range shuffle + one P-row collect. The plan contains
no single-partition exchange (asserted in tests). Results are a pure
function of the (id → tokens) mapping — independent of parallelism
and of where the range sampler happens to place partition boundaries
(ids are unique, so the cross-partition order is total); asserted by
an any-parallelism equality test against a pandas cumsum oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    capacity: int,
    token_col: str,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (id_col, n_tok, pack_id, pack_offset, straddles):
    pack_id = the 0-based ``capacity``-token window the document's
    first token lands in under concat-and-chunk in ascending id order;
    pack_offset = its position within that window; straddles = True
    when the document crosses into the next window."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    spark = df.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    src = df.select(
        F.col(id_col).alias("_id"), F.col(token_col).cast("long").alias("n_tok")
    )
    # pin the range-partition assignment: the window pass and the
    # totals pass below MUST see the same _pid per row (the range
    # sampler is not guaranteed to re-draw identical boundaries on
    # recompute).
    rp = (
        src.repartitionByRange(P, "_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = rp.withColumn("_cum", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    totals = {
        r["_pid"]: int(r["t"] or 0)
        for r in rp.groupBy("_pid").agg(F.sum("n_tok").alias("t")).collect()
    }
    # range partition i holds strictly smaller ids than partition i+1,
    # so the exclusive prefix over ascending pid is the global one.
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    cum = (F.col("_cum") + F.col("_off")).alias("_cb")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .select(F.col("_id").alias(id_col), "n_tok", cum)
        .select(
            id_col,
            "n_tok",
            F.floor(F.col("_cb") / capacity).cast("long").alias("pack_id"),
            F.pmod(F.col("_cb"), F.lit(capacity)).cast("long").alias("pack_offset"),
            ((F.pmod(F.col("_cb"), F.lit(capacity)) + F.col("n_tok")) > capacity).alias(
                "straddles"
            ),
        )
    )


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-pack audit row over a ``pack_sequences`` result:
    (pack_id, n_docs, n_started_tokens, straddle_in) — n_started_tokens
    counts tokens of documents STARTING in the pack (> capacity when a
    long straddler starts there), straddle_in whether the pack ends
    mid-document."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_started_tokens"),
            F.max(F.col("straddles").cast("int")).cast("boolean").alias("straddle_in"),
        )
        .orderBy("pack_id")
    )
