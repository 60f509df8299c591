"""Host compute-capacity probe for the scaling protocol.

Runs an identical fixed-size NumPy workload on N processes for
N in {2, 8, 16, 32} and reports aggregate throughput. On dedicated
hardware, throughput grows ~linearly in N; on an oversubscribed /
CPU-capped VM it plateaus — and that plateau is the EXTERNAL ceiling
on any N -> 4N scaling measurement run inside the VM. The scaling
report normalizes the engine's measured superstep speedup against the
attainable speedup this probe measures (BENCH/BASELINE.md).

Usage: python jobs/host_probe.py   # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _work(_):
    import numpy as np

    a = np.random.RandomState(0).rand(400, 400)
    s = 0.0
    for _ in range(60):
        s += float(np.dot(a, a).sum())
    return s


def main() -> None:
    out = {}
    for n in (2, 8, 16, 32):
        with mp.Pool(n) as p:
            p.map(_work, range(n))  # warm the pool + BLAS
            t0 = time.monotonic()
            p.map(_work, range(n))
            dt = time.monotonic() - t0
        out[n] = round(n / dt, 2)
    pairs = {
        "2->8": round(out[8] / out[2], 3),
        "8->32": round(out[32] / out[8], 3),
    }
    print(json.dumps({"throughput_tasks_per_s": out, "attainable_speedup": pairs}))


if __name__ == "__main__":
    main()
