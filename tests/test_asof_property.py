"""Property-based testing (SURVEY.md §5.4) for the as-of join:
random keyed/timestamped frames vs an explicit single-node oracle,
both boundary modes, null values included.

Hypothesis is derandomized (CI-deterministic); each example is one
small Spark job, so example counts are kept modest.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from reddit_processing_spark.operators.temporal import asof_join

EPOCH = dt.datetime(2026, 1, 1)


def _ts(sec: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=sec)


keys = st.integers(min_value=0, max_value=3)
secs = st.integers(min_value=0, max_value=50)
vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))

left_rows = st.lists(st.tuples(keys, secs), min_size=1, max_size=12)
right_rows = st.lists(st.tuples(keys, secs, vals), min_size=0, max_size=12)


def _oracle(left, right, inclusive):
    out = []
    for i, (k, ls) in enumerate(left):
        cands = [
            (rs, v)
            for (rk, rs, v) in right
            if rk == k and (rs <= ls if inclusive else rs < ls)
        ]
        out.append((i, max(cands)[1] if cands else None))
    return dict(out)


@pytest.mark.parametrize("inclusive", [True, False])
@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=left_rows, right=right_rows)
def test_asof_join_matches_oracle(spark, inclusive, left, right):
    # determinism contract: right unique per (key, ts) — dedup keeping
    # the max value (None sorts lowest) like a pre-aggregated feed
    rdedup = {}
    for rk, rs, v in right:
        cur = rdedup.get((rk, rs))
        rdedup[(rk, rs)] = v if cur is None else max(cur, v) if v is not None else cur
    right = [(rk, rs, v) for (rk, rs), v in rdedup.items()]

    ldf = spark.createDataFrame(
        [(i, k, _ts(s)) for i, (k, s) in enumerate(left)],
        "row_id long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(s), v) for (k, s, v) in right], "k long, rts timestamp, val long"
    )
    got = {
        r["row_id"]: r["val"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts",
            value_cols=["val"], inclusive=inclusive,
        ).collect()
    }
    want = _oracle(left, right, inclusive)
    assert got == want
