"""Deterministic synthetic transcripts generator (FIXTURES.md §A).

Pure-function hash-based (splitmix64) — NO RNG stream — so any subset
regenerates identically at any parallelism. This is a correctness
precondition for the resume and parallelism-invariance tests
(SURVEY.md §5.4).

Schema is exactly the BASELINE.json input_hint shape:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Per-turn user identity is intentionally NOT a column (the input is
six columns exactly); it is derivable from (conv, turn) by the shared
arithmetic rule ``user_key`` below — the Spark engine and the pandas
oracle recompute it identically (FIXTURES.md §A.1).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

SEED = 42
EPOCH = np.datetime64("2026-01-01T00:00:00", "us")

# user-identity rule shared by engine (Spark SQL) and oracle (pandas):
#   user_id = pmod(conv * U_A + turn * U_B, n_users)
# chosen to be overflow-free in int64 (conv <= 1e6) and expressible with
# built-in Column arithmetic (no Python hashing on the Spark side).
U_A = 2654435761
U_B = 40503

TIERS = {
    #        n_convs, clip, n_mega, mega_len
    "tiny": (200, 30, 2, 50),
    "small": (5_000, 80, 3, 500),
    "bench": (200_000, 200, 5, 50_000),
    # scale: mid-size tier (~31M turns → ~26M aggregated edges).
    # Generated + written in conv-range chunks so peak memory stays at
    # one bench-tier chunk.
    "scale": (1_600_000, 200, 8, 50_000),
    # xscale: the two-parallelism scaling-efficiency tier (~250M turns
    # → ~208M aggregated edges) — sized so per-superstep compute
    # dominates the fixed per-step costs (job scheduling, checkpoint
    # commit) at 32 cores; below this the measurement says more about
    # constant overheads than about the engine's scaling.
    "xscale": (12_800_000, 200, 16, 50_000),
}

CHUNK_CONVS = 200_000

TORTURE_SUFFIX = ' \t\n"quoted",comma|pipe é😀中文مرحبا  '


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 on uint64 (public-domain constant set)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _h(conv: np.ndarray, turn: np.ndarray, salt: int) -> np.ndarray:
    mixed = (
        conv.astype(np.uint64) * np.uint64(1_000_003)
        + turn.astype(np.uint64)
        + np.uint64(SEED * 0x9E37 + salt * 0x85EB_CA6B)
    )
    return _splitmix64(mixed)


def n_users_for(n_convs: int) -> int:
    return max(1, n_convs // 3)


def tier_n_users(tier: str) -> int:
    """Analytic n_users for a fixture tier — lets jobs skip the
    distinct-conv_id inference pass over the full table."""
    return n_users_for(TIERS[tier][0])


def user_key_ints(conv: np.ndarray, turn: np.ndarray, n_users: int) -> np.ndarray:
    return ((conv.astype(np.int64) * U_A + turn.astype(np.int64) * U_B) % n_users).astype(
        np.int64
    )


def _conv_lengths(n_convs: int, clip: int, n_mega: int, mega_len: int) -> np.ndarray:
    """Zipf(s=1.3) clipped to [1, clip]; fixed slots become mega-threads."""
    s = 1.3
    k = np.arange(1, clip + 1, dtype=np.float64)
    pmf = k**-s
    cdf = np.cumsum(pmf / pmf.sum())
    conv = np.arange(n_convs, dtype=np.uint64)
    u = _h(conv, np.zeros_like(conv), salt=1).astype(np.float64) / 2**64
    lengths = (np.searchsorted(cdf, u, side="right") + 1).astype(np.int64)
    # deterministic edge-case slots (FIXTURES.md §A.2):
    if n_convs > 0:
        lengths[0] = 1  # single-turn conversation
    if n_convs > 1:
        lengths[1] = 5  # all-system conversation
    if n_convs > 2:
        lengths[2] = max(lengths[2], 3)  # holds the duplicated (conv,turn)
    if n_convs > 3:
        lengths[3] = max(lengths[3], 1)  # holds the empty-text row
    # mega-threads at fixed slots near the middle (skew targets)
    for i in range(n_mega):
        slot = 10 + i
        if slot < n_convs:
            lengths[slot] = mega_len
    return lengths


def generate_transcripts(
    tier: str, conv_lo: int | None = None, conv_hi: int | None = None
) -> pd.DataFrame:
    """Build the transcripts table for a tier (optionally a conv-id
    range chunk — every row is a pure function of (seed, conv, turn),
    so chunked generation is byte-identical to whole generation).

    Role rule (stateless so it vectorizes, FIXTURES.md §A.1): turn 0 is
    'system' when h%5==0 else 'user'; afterwards user/assistant
    alternation where a would-be-user turn following an assistant turn
    becomes 'tool' with hash-probability 0.15.
    """
    n_convs, clip, n_mega, mega_len = TIERS[tier]
    lengths_all = _conv_lengths(n_convs, clip, n_mega, mega_len)
    lo = 0 if conv_lo is None else conv_lo
    hi = n_convs if conv_hi is None else min(conv_hi, n_convs)
    lengths = lengths_all[lo:hi]
    conv = np.repeat(np.arange(lo, hi, dtype=np.int64), lengths)
    total = int(lengths.sum())
    # per-row turn index: arange within each conversation
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    turn = (np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)).astype(np.int64)

    h = _h(conv.astype(np.uint64), turn.astype(np.uint64), salt=2)
    h_role = _h(conv.astype(np.uint64), turn.astype(np.uint64), salt=3)

    # role state machine (vectorized, stateless in (conv, turn)):
    first_is_system = (_h(conv.astype(np.uint64), np.zeros(total, np.uint64), salt=4) % 5) == 0
    c = turn - first_is_system.astype(np.int64)  # position in the u/a cycle
    base_user = (c % 2) == 0
    role = np.where(base_user, "user", "assistant").astype(object)
    role[(turn == 0) & first_is_system] = "system"
    interject = base_user & (c > 0) & ((h_role % 100) < 15) & (turn > 0)
    role[interject] = "tool"
    # fixed all-system conversation (slot 1)
    role[conv == 1] = "system"

    tool = np.where(
        role == "tool",
        np.array(["search", "calc", "code", "browse"], dtype=object)[(h % 4).astype(np.int64)],
        None,
    )

    conv_id = pd.Series(conv).map(lambda i: f"c{i:08d}").to_numpy(dtype=object)
    hm = (h % 1000).astype(np.int64)
    text = (
        "t|"
        + pd.Series(conv_id).astype(str)
        + "|"
        + pd.Series(turn).astype(str)
        + "|"
        + pd.Series(hm).astype(str)
    ).to_numpy(dtype=object)
    torture = (h % 97) == 0
    text[torture] = text[torture] + TORTURE_SUFFIX
    deleted = (h % 89) == 1
    text[deleted] = "[deleted]"
    # one empty-string text at a fixed slot
    empty_mask = (conv == 3) & (turn == 0)
    text[empty_mask] = ""

    ts = EPOCH + (conv * 3_600_000_000 + turn * 7_000_000 + (h % 5).astype(np.int64) * 1_000_000)

    df = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn.astype(np.int32),
            "role": role.astype(object),
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )

    # duplicate (conv_id, turn_idx) pair at a fixed slot — exactly one,
    # exercising dedup-keep-first-by-ts (conv 2, turn 1 duplicated later).
    if lo <= 2 < hi and lengths_all[2] >= 2:
        src = df[(df.conv_id == "c00000002") & (df.turn_idx == 1)].iloc[[0]].copy()
        src["ts"] = src["ts"] + pd.Timedelta(seconds=11)
        src["text"] = src["text"] + "|dup-later-must-lose"
        df = pd.concat([df, src], ignore_index=True)

    # out-of-order physical placement: shuffle rows deterministically by a
    # hash of (conv, turn, row#) — stable ordering must come from columns.
    order = _splitmix64(np.arange(len(df), dtype=np.uint64) + np.uint64(SEED)).argsort()
    return df.iloc[order].reset_index(drop=True)


def fixture_path(tier: str, base_dir: str | None = None) -> str:
    base = base_dir or os.path.join(os.path.dirname(__file__), "..", "..", "tests", "data")
    return os.path.abspath(os.path.join(base, f"transcripts_{tier}"))


def ensure_fixture(tier: str, base_dir: str | None = None) -> str:
    """Generate-and-cache the tier's transcripts as parquet; returns dir."""
    path = fixture_path(tier, base_dir)
    marker = os.path.join(path, "_FIXTURE_OK")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            pa.field("conv_id", pa.string(), False),
            pa.field("turn_idx", pa.int32(), False),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    n_convs = TIERS[tier][0]
    total_rows = 0
    part = 0
    for lo in range(0, n_convs, CHUNK_CONVS):
        df = generate_transcripts(tier, lo, lo + CHUNK_CONVS)
        table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
        pq.write_table(table, os.path.join(path, f"part-{part:03d}.parquet"))
        total_rows += len(df)
        part += 1
    with open(marker, "w") as f:
        json.dump({"tier": tier, "rows": total_rows, "seed": SEED}, f)
    return path
