"""Pure-numpy PageRank oracle (networkx's pagerank needs scipy, which
this sandbox lacks — this implements the identical textbook iteration
networkx documents: weighted out-normalization, damping alpha,
dangling mass redistributed uniformly, L1 stopping rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank(
    edges: pd.DataFrame,  # columns src, dst, w
    alpha: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 5000,
    personalization: dict[int, float] | None = None,
) -> dict[int, float]:
    vids = np.unique(np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()]))
    n = len(vids)
    idx = {v: i for i, v in enumerate(vids)}
    src = edges["src"].map(idx).to_numpy()
    dst = edges["dst"].map(idx).to_numpy()
    w = edges["w"].to_numpy(dtype=np.float64)

    out_w = np.zeros(n)
    np.add.at(out_w, src, w)
    dangling = out_w == 0.0
    w_norm = w / out_w[src]

    # teleport vector: uniform, or the normalized personalization dict
    # (missing vids weight 0) — networkx _pagerank_scipy semantics,
    # dangling weights defaulting to the same vector.
    if personalization is None:
        p = np.full(n, 1.0 / n)
    else:
        p = np.array([float(personalization.get(int(v), 0.0)) for v in vids])
        s = p.sum()
        if s <= 0:
            raise ZeroDivisionError("personalization sums to zero")
        p = p / s

    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] * w_norm)
        dangle = r[dangling].sum()
        r_new = (1 - alpha) * p + alpha * (contrib + dangle * p)
        if np.abs(r_new - r).sum() < tol:
            r = r_new
            break
        r = r_new
    return {int(v): float(r[idx[v]]) for v in vids}
