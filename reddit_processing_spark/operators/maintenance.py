"""Table maintenance: small-file compaction and sort-for-skipping —
the housekeeping a 100 TB parquet/Iceberg estate runs continuously
(Iceberg calls it ``rewrite_data_files``; this is the analog for the
engine's parquet+manifest backend, SURVEY.md §4.2.7).

Why it matters at scale: streaming sinks and fine-grained partitioned
writes accumulate thousands of KB-sized files; every downstream scan
then pays per-file open/footer costs and the scheduler pays per-split
overhead. Compaction rewrites a directory into ~target-sized files;
optionally sorting within files clusters row-group min/max statistics
so selective scans skip whole row groups (data skipping — the poor
man's z-order for a single sort dimension).

Atomicity: the rewrite lands in a sibling temp directory and swaps in
via two ``os.rename`` calls (old → trash, new → path). Each rename is
atomic on a local/POSIX filesystem, but the PAIR is not: between the
two renames nothing is live at ``path``. Crash recovery is therefore
explicit — the data is intact in ``<path>.compact-trash``, and the
next ``compact_parquet`` call detects the orphaned-trash + missing-
path state and restores the original before doing anything else (a
caller can also restore by hand with one ``mv``). The original
directory is retained as ``<path>.compact-trash`` until the next
successful compaction (or the caller) deletes it. On object stores
this whole seam is where Iceberg's snapshot commit takes over (same
argument as ``ParquetTableIO``'s manifest rename).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for _, _, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
    zorder_bits: int = 16,
    keep_trash: bool = True,
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_file_bytes)`` files (min 1).

    ``sort_cols``: sortWithinPartitions on these columns before the
    write so each file's row groups carry tight min/max statistics on
    them — selective scans then skip row groups (data skipping).
    ``zorder_cols`` (mutually exclusive): GLOBAL sort by the Morton
    interleave of these columns (functions/zorder.py) — bounds every
    file's extent in every listed dimension, so predicates on ANY of
    them skip files, where a plain sort only serves its first column.
    Repartition (a shuffle) rather than coalesce: coalesce merges
    *adjacent* partitions and inherits their skew, producing uneven
    output files; compaction's whole point is even ones. (Z-order uses
    repartitionByRange on the key — a range shuffle — for the same
    even-file outcome while keeping the curve order global.)

    Returns {files_before, files_after, bytes, rows} — rows is
    re-counted from the rewritten directory (cheap metadata count) and
    compared against the input as a guard before the swap."""
    live = path.rstrip("/")
    tmp = live + ".compact-tmp"
    trash = live + ".compact-trash"
    # Crash recovery (round-3 ADVICE): a previous run that died between
    # its two swap renames left NOTHING live at ``path`` with the
    # original parked in trash. Detect that orphaned state and restore
    # the original before compacting — without this, the data would sit
    # invisible in trash and the read below would fail on a missing
    # path.
    if not os.path.exists(live) and os.path.exists(trash):
        os.rename(trash, live)

    files_before = parquet_file_count(path)
    total_bytes = _dir_bytes(path)
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))

    if sort_cols and zorder_cols:
        raise ValueError("compact_parquet: sort_cols and zorder_cols are mutually exclusive")

    src = spark.read.parquet(path)
    rows_before = src.count()
    if zorder_cols:
        from ..functions.zorder import zorder_key

        zk = zorder_key(src, zorder_cols, bits=zorder_bits)
        out = (
            src.withColumn("_zk", zk)
            .repartitionByRange(n_files, F.col("_zk"))
            .sortWithinPartitions("_zk")
            .drop("_zk")
        )
    else:
        out = src.repartition(n_files)
        if sort_cols:
            out = out.sortWithinPartitions(*[F.col(c) for c in sort_cols])

    shutil.rmtree(tmp, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)

    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch ({rows_before} -> {rows_after}); "
            f"original left untouched at {path}"
        )
    # drop the PREVIOUS run's retained trash only now, once this run's
    # replacement is validated and about to swap in — a failed run must
    # never have destroyed the last good backup.
    shutil.rmtree(trash, ignore_errors=True)
    os.rename(live, trash)   # atomic on POSIX
    os.rename(tmp, live)     # …but the pair is not: see module docstring
    if not keep_trash:
        shutil.rmtree(trash, ignore_errors=True)
    return {
        "files_before": files_before,
        "files_after": parquet_file_count(path),
        "bytes": total_bytes,
        "rows": rows_after,
    }
