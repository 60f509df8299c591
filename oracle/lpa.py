"""Pure-pandas synchronous LPA oracle — the identical schedule and
tie-break spec as reddit_processing_spark.graph.lpa (networkx's LPA
is asynchronous/randomized, so it cannot serve as an exact-match
oracle — SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def label_propagation(edges: pd.DataFrame, max_iter: int = 10) -> dict[int, int]:
    """edges: (src, dst, w) directed-weighted; symmetrized by summing."""
    fwd = edges[["src", "dst", "w"]]
    rev = edges.rename(columns={"src": "dst", "dst": "src"})[["src", "dst", "w"]]
    sym = (
        pd.concat([fwd, rev], ignore_index=True)
        .query("src != dst")
        .groupby(["src", "dst"], as_index=False)["w"]
        .sum()
    )
    vids = np.unique(sym["src"].to_numpy())
    labels = {int(v): int(v) for v in vids}

    for _ in range(max_iter):
        lab = sym["src"].map(labels)
        scores = (
            pd.DataFrame({"vid": sym["dst"], "label": lab, "w": sym["w"]})
            .groupby(["vid", "label"], as_index=False)["w"]
            .sum()
        )
        scores = scores.sort_values(
            ["vid", "w", "label"], ascending=[True, False, True], kind="mergesort"
        )
        best = scores.drop_duplicates("vid", keep="first")
        new_labels = dict(labels)
        changed = 0
        for vid, label in zip(best["vid"].astype(int), best["label"].astype(int)):
            if new_labels[vid] != label:
                new_labels[vid] = label
                changed += 1
        labels = new_labels
        if changed == 0:
            break
    return labels
