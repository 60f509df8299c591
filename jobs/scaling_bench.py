"""Two-parallelism scaling evidence (BASELINE.md protocol).

No multi-executor cluster exists in this sandbox, so the north-rule's
N→4N criterion is evidenced by running the SAME job, SAME input, SAME
code at local[N] and local[4N] (subprocesses so each run gets a fresh
JVM with its own master), with shuffle partitions scaled 2x cores.

Writes BENCH/BASELINE.md with both throughputs, the per-superstep
series, output-equality confirmation, and
efficiency = (thr_4N / thr_N) / 4.

Usage: python jobs/scaling_bench.py [--tier bench] [--n 8] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(
    cores: int, transcripts: str, steps: int, workdir: str, n_users: int,
    kernel: str = "csr",
) -> dict:
    ckpt = os.path.join(workdir, f"ckpt_{cores}")
    out = os.path.join(workdir, f"ranks_{cores}")
    cmd = [
        sys.executable,
        os.path.join(REPO, "jobs", "run_pagerank.py"),
        "--transcripts", transcripts,
        "--ckpt", ckpt,
        "--out", out,
        "--tol", "0",
        "--max-iter", str(steps),
        "--master", f"local[{cores}]",
        "--partitions", str(2 * cores),
        "--n-users", str(n_users),
        "--kernel", kernel,
    ]
    env = dict(os.environ)
    res = subprocess.run(cmd, capture_output=True, text=True, env=env, check=True)
    line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
    m = json.loads(line)
    m["ranks_path"] = out
    return m


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tier", default="bench")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--kernel", choices=["csr", "sql"], default="csr")
    args = p.parse_args()

    from reddit_processing_spark.sources.fixtures import ensure_fixture, tier_n_users

    transcripts = ensure_fixture(args.tier)
    workdir = tempfile.mkdtemp(prefix="scaling_")

    runs = {}
    for cores in (args.n, 4 * args.n):
        print(f"== local[{cores}] ==", file=sys.stderr)
        runs[cores] = run_one(
            cores, transcripts, args.steps, workdir, tier_n_users(args.tier),
            args.kernel,
        )

    lo, hi = runs[args.n], runs[4 * args.n]
    # steady-state (warm) throughput: superstep 1 carries one-time JVM
    # JIT + Python worker spin-up identical at both sizes; a production
    # run is hundreds of supersteps where the warm rate is the rate.
    thr_lo = lo["edges_per_sec_warm"]
    thr_hi = hi["edges_per_sec_warm"]
    eff = (thr_hi / thr_lo) / 4.0

    # output equality across parallelism levels (allclose 1e-6 on ranks)
    import duckdb

    con = duckdb.connect()
    mism = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{lo["ranks_path"]}/*.parquet') a
        JOIN read_parquet('{hi["ranks_path"]}/*.parquet') b USING (vid)
        WHERE abs(a.rank - b.rank) > 1e-6
        """
    ).fetchone()[0]
    n_lo = con.execute(
        f"SELECT count(*) FROM read_parquet('{lo['ranks_path']}/*.parquet')"
    ).fetchone()[0]
    n_hi = con.execute(
        f"SELECT count(*) FROM read_parquet('{hi['ranks_path']}/*.parquet')"
    ).fetchone()[0]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # raw per-run report; the consolidated analysis lives in
    # BENCH/BASELINE.md (hand-maintained, never clobbered here)
    md = os.path.join(
        REPO, "BENCH",
        f"SCALING_{args.tier}_{args.n}_{4 * args.n}_{args.kernel}.md",
    )
    with open(md, "w") as f:
        f.write(
            f"""# {os.path.basename(md)} — two-parallelism scaling evidence

Protocol per BASELINE.md: same fixture (tier `{args.tier}`,
{lo["edges"]} aggregated edges, {lo["vertices"]} vertices), same code,
{args.steps} PageRank supersteps, fresh JVM per run via subprocess.

| config | shuffle partitions | loop wall (s) | warm edges/sec/superstep |
| --- | --- | --- | --- |
| local[{args.n}] | {lo["shuffle_partitions"]} | {lo["loop_s"]} | {thr_lo:,.0f} |
| local[{4 * args.n}] | {hi["shuffle_partitions"]} | {hi["loop_s"]} | {thr_hi:,.0f} |

Throughput is steady-state (superstep 2+): the first superstep carries
one-time JVM JIT + Python-worker spin-up, identical at both sizes and
amortized to nothing over a production run's hundreds of supersteps.
Cold first-step walls are visible in the per-superstep series below.

**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}** (target >= 0.8)

Per-superstep wall ms:
- local[{args.n}]: {lo["per_superstep_wall_ms"]}
- local[{4 * args.n}]: {hi["per_superstep_wall_ms"]}

Output equality: {n_lo} vs {n_hi} rank rows, {mism} rows differ by
more than 1e-6 (requirement: 0).

Raw metrics:
```json
{json.dumps({"n": lo, "4n": hi}, indent=2)}
```
"""
        )
    print(json.dumps({"efficiency": eff, "thr_n": thr_lo, "thr_4n": thr_hi, "rank_mismatches": mism, "report": md}))


if __name__ == "__main__":
    main()
