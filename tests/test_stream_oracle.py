"""Preconditions that make the batch-replay DuckDB oracle for
``stream_window_counts`` (__spark_entry__._stream_window_sql) EXACT:

1. the tiny transcript fixture is ONE parquet file, so every streaming
   leg replays as a single data micro-batch (plus the no-data
   finalization batch) and the final watermark is a pure function of
   the input — no batch-boundary nondeterminism;
2. the fixture's single duplicate (conv_id, turn_idx) pair falls in the
   SAME 1-hour tumbling bucket, so dropDuplicatesWithinWatermark's
   arbitrary keep-first collapses to the oracle's min(ts)
   canonicalization without changing any window count.

Full value parity Spark-vs-DuckDB is asserted by
tests/test_entry_oracle.py::test_oracled_query[stream_window_counts].
If either precondition breaks (fixture regenerated differently), fail
HERE with a pointed message rather than as an opaque hash mismatch.
"""

from __future__ import annotations

import glob
import os

import duckdb


def test_fixture_is_single_file(tiny_dir):
    files = glob.glob(os.path.join(tiny_dir, "*.parquet"))
    assert len(files) == 1, (
        "batch-replay streaming oracle assumes ONE micro-batch; the tiny "
        f"fixture now has {len(files)} parquet files — revisit "
        "_stream_window_sql's watermark-emission rule"
    )


def test_duplicate_pair_shares_hour_bucket(tiny_dir):
    g = os.path.join(tiny_dir, "*.parquet")
    con = duckdb.connect()
    dups = con.execute(
        f"""
        SELECT conv_id, turn_idx,
               count(*) AS n,
               count(DISTINCT date_trunc('hour', ts)) AS n_buckets
        FROM read_parquet('{g}')
        GROUP BY 1, 2 HAVING count(*) > 1
        """
    ).fetchall()
    assert len(dups) == 1, f"fixture contract: exactly one dup pair, got {dups}"
    assert dups[0][3] == 1, (
        "dup (conv_id, turn_idx) rows landed in DIFFERENT hour buckets — "
        "keep-first dedup is no longer bucket-invariant and the tumbling "
        f"oracle leg is unsound: {dups}"
    )
