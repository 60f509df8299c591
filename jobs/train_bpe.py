"""Offline BPE trainer: documents parquet → merges file.

Produces the checked-in merge table consumed by
functions/bpe.bpe_token_count_exact (the exact-token-count seam next
to the regex approximation). Training is the Sennrich greedy loop over
a DRIVER-COLLECTED word-frequency table: BPE training is inherently a
sequential global argmax per merge, so the distributed part is only
the corpus→(word, freq) reduction — that aggregate shrinks the corpus
to its vocabulary, which is what must fit on the driver (standard for
tokenizer training; GPT-2's vocabulary fits in MBs at 100 TB corpus
scale because vocabulary growth is ~Heaps' law, not linear).

Usage:
  python jobs/train_bpe.py --documents /root/testdata/sf0.01/documents.parquet \
      --out reddit_processing_spark/functions/data/bpe_merges.txt \
      [--n-merges 512] [--text-col text]

Prints one JSON line {n_merges, n_words, out}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n-merges", type=int, default=512)
    p.add_argument("--text-col", default="text")
    p.add_argument("--master", default="local[8]")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from reddit_processing_spark.functions.bpe import save_merges
    from reddit_processing_spark.session import get_spark

    spark = get_spark(master=args.master, shuffle_partitions=16)
    # distributed word-frequency reduction; only the vocabulary lands
    # on the driver. Deterministic: sorted before the greedy loop.
    wf = (
        spark.read.parquet(args.documents)
        .select(F.explode(F.split(F.trim(F.col(args.text_col)), "\\s+")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w").agg(F.count("*").alias("f"))
        .orderBy("w")
        .collect()
    )

    # greedy merge loop over the (word, freq) table — reuse the
    # reference trainer by expanding nothing: feed it a synthetic
    # one-doc-per-word stream would lose freqs, so train directly.
    from collections import Counter

    from reddit_processing_spark.functions.bpe import END

    vocab = Counter({tuple(r["w"]) + (END,): int(r["f"]) for r in wf})
    merges = []
    words = list(vocab.items())
    for _ in range(args.n_merges):
        pairs = Counter()
        for sym, freq in words:
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        top = max(pairs.values())
        best = min(pr for pr, c in pairs.items() if c == top)
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        nw = []
        for sym, freq in words:
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nw.append((tuple(out), freq))
        words = nw

    save_merges(merges, args.out)
    res = {"n_merges": len(merges), "n_words": len(wf), "out": args.out}
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
