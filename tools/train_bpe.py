"""Train a small character-level BPE merges table (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
original BPE-for-tokenization algorithm, without the end-of-word marker)
on the deterministic synthetic corpus, and write it in the public
merges.txt format (one space-separated pair per line, rank = line
order). No external data: the corpus is the driver-generated
/root/testdata parquet.

Deterministic: pair selection is (max frequency, then lexicographically
smallest pair); training stops at --n-merges or when the best pair
occurs only once.

Usage: python tools/train_bpe.py [sf_dir] [--n-merges N] [--out PATH]
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys

import pyarrow.parquet as pq

DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pdf_parser_spark", "analytics", "bpe_merges.txt")


def word_freqs(sf_dir: str) -> collections.Counter:
    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    freqs: collections.Counter = collections.Counter()
    for t in texts:
        freqs.update(re.split(r"\s+", (t or "").strip()))
    freqs.pop("", None)
    return freqs


def train(freqs: collections.Counter,
          n_merges: int) -> list[tuple[str, str]]:
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): f for w, f in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[syms[i], syms[i + 1]] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--n-merges", type=int, default=120)
    ap.add_argument("--out", default=DEFAULT_OUT)
    args = ap.parse_args()

    merges = train(word_freqs(args.sf_dir), args.n_merges)
    with open(args.out, "w", encoding="utf-8") as f:
        f.write("#version: 0.2 — char-level BPE trained by "
                "tools/train_bpe.py (deterministic)\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
