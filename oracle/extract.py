"""Single-node pure-pandas oracle for the transcript extraction.

This module plays the role of "the reference extraction"
(BASELINE.json: "preserving per-turn text equality vs the reference
extraction") — the reference checkout is empty (SURVEY.md §0), so the
extraction spec is defined HERE, imperatively and obviously-correct,
and the Spark engine must match it exactly:

- dedup keep-first per (conv_id, turn_idx) by (ts, text)
- stable order (conv_id, turn_idx, ts)
- role(t-1) -> role(t) adjacent edges, kind='role'
- user <-> thread edge pair per 'user' turn, kind='reply'

Edges are compared as KEYED multisets (src/dst entity keys, not hashed
vids) so the oracle needs no xxhash64 implementation; vid-collision
freedom is tested separately on the Spark side.
"""

from __future__ import annotations

import pandas as pd

from reddit_processing_spark.sources.fixtures import U_A, U_B


def user_key(conv_num: pd.Series, turn_idx: pd.Series, n_users: int) -> pd.Series:
    uid = (conv_num.astype("int64") * U_A + turn_idx.astype("int64") * U_B) % n_users
    return "u" + uid.astype(str)


def extract_turns(df: pd.DataFrame) -> pd.DataFrame:
    out = df[df["conv_id"].notna() & df["turn_idx"].notna() & df["role"].notna()].copy()
    out = out.sort_values(
        ["conv_id", "turn_idx", "ts", "text"], kind="mergesort", na_position="last"
    )
    out = out.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")
    return out.reset_index(drop=True)


def derive_edges(df: pd.DataFrame, n_users: int | None = None) -> pd.DataFrame:
    """Keyed edge multiset: columns
    (src_type, src_key, dst_type, dst_key, kind, conv_id, w)."""
    turns = extract_turns(df)
    if n_users is None:
        n_users = max(1, turns["conv_id"].nunique() // 3)

    turns = turns.sort_values(["conv_id", "turn_idx", "ts"], kind="mergesort")
    prev_role = turns.groupby("conv_id", sort=False)["role"].shift(1)
    mask = prev_role.notna()
    role_edges = pd.DataFrame(
        {
            "src_type": "role",
            "src_key": prev_role[mask].to_numpy(),
            "dst_type": "role",
            "dst_key": turns.loc[mask, "role"].to_numpy(),
            "kind": "role",
            "conv_id": turns.loc[mask, "conv_id"].to_numpy(),
            "w": 1.0,
        }
    )

    users = turns[turns["role"] == "user"]
    conv_num = users["conv_id"].str.slice(1).astype("int64")
    ukey = user_key(conv_num, users["turn_idx"], n_users)
    fwd = pd.DataFrame(
        {
            "src_type": "user",
            "src_key": ukey.to_numpy(),
            "dst_type": "thread",
            "dst_key": users["conv_id"].to_numpy(),
            "kind": "reply",
            "conv_id": users["conv_id"].to_numpy(),
            "w": 1.0,
        }
    )
    rev = fwd.rename(
        columns={
            "src_type": "dst_type",
            "src_key": "dst_key",
            "dst_type": "src_type",
            "dst_key": "src_key",
        }
    )[fwd.columns]
    return pd.concat([role_edges, fwd, rev], ignore_index=True)
