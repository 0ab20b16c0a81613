"""Interleaved A/B of the pure-Python extract kernel between two repo
checkouts at fixed input — no Spark, no JVM, so host scheduling noise is
the only confound and interleaving + best-of-5 averages it out.

Usage: python tools/kernel_ab.py <repoA> <repoB> [rounds]

Each side imports its OWN datagen + kernel, so input differences that are
part of the code under test (e.g. round-3's AES-256 fixture docs) are
included in that side's measurement. Used to adjudicate the round-3
"warm-pipeline regression" (docs/ROUND4.md §1).
"""
from __future__ import annotations

import subprocess
import sys
import textwrap

_CHILD = textwrap.dedent(
    """
    import sys, time
    repo = sys.argv[1]
    sys.path.insert(0, repo)
    import pandas as pd
    import pyarrow.parquet as pq

    docs = pq.read_table('/root/testdata/sf0.1/documents.parquet').to_pandas()
    reps = []
    for r in range(4):
        d = docs.copy()
        d['doc_id'] = d['doc_id'] + r * 10_000_000
        reps.append(d)
    docs = pd.concat(reps, ignore_index=True)
    sample = docs.iloc[::4].reset_index(drop=True)  # 5,000 docs

    from pdf_parser_spark.datagen.pages import build_pages_pdf
    from pdf_parser_spark.engine.job import _extract_batches

    def run():
        pages = build_pages_pdf(sample)
        pages["part_id"] = -1
        return sum(len(o) for o in _extract_batches(iter([pages])))

    run()  # warm (imports, regex compile, crypto memo)
    walls = []
    for _ in range(5):
        t0 = time.time(); n = run(); walls.append(time.time() - t0)
    print(round(min(walls), 4))
    """
)


def measure(repo: str) -> float:
    out = subprocess.run([sys.executable, "-c", _CHILD, repo],
                         capture_output=True, text=True, check=True)
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    a_walls, b_walls = [], []
    for i in range(rounds):
        a = measure(repo_a)
        b = measure(repo_b)
        a_walls.append(a)
        b_walls.append(b)
        print(f"round {i + 1}: A={a:.3f}  B={b:.3f}", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(f"median A={med(a_walls):.3f}  B={med(b_walls):.3f}  "
          f"ratio A/B={med(a_walls) / med(b_walls):.3f}")


if __name__ == "__main__":
    main()
