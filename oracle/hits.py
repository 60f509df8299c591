"""Pure-numpy HITS oracle (networkx's hits() needs scipy ARPACK,
absent in this sandbox — this is the textbook Kleinberg power
iteration the ARPACK svds converges to: principal left/right singular
vectors of the weighted adjacency matrix, L1-normalized).

a ← Aᵀh, h ← Aa each round (normalization commutes through the linear
maps, applied once per round for numeric stability); stop when the
L1 change of the normalized hub vector < tol."""

from __future__ import annotations

import numpy as np
import pandas as pd


def hits(
    edges: pd.DataFrame,  # columns src, dst, w  (directed src->dst)
    tol: float = 1e-12,
    max_iter: int = 10000,
) -> tuple[dict[int, float], dict[int, float]]:
    vids = np.unique(np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()]))
    n = len(vids)
    idx = {v: i for i, v in enumerate(vids)}
    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()
    w = edges["w"].to_numpy(dtype=np.float64)

    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(max_iter):
        a_new = np.zeros(n)
        np.add.at(a_new, dst, h[src] * w)
        h_new = np.zeros(n)
        np.add.at(h_new, src, a_new[dst] * w)
        sa, sh = a_new.sum(), h_new.sum()
        if sa <= 0 or sh <= 0:  # no edges reachable — degenerate
            return (
                {int(v): 0.0 for v in vids},
                {int(v): 0.0 for v in vids},
            )
        a_new /= sa
        h_new /= sh
        done = np.abs(h_new - h).sum() < tol
        h, a = h_new, a_new
        if done:
            break
    return (
        {int(v): float(h[idx[v]]) for v in vids},
        {int(v): float(a[idx[v]]) for v in vids},
    )
