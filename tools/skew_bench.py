"""Skew stress bench: measure what oversized-doc spreading buys on a
corpus with a heavy tail (r3 verdict item 6).

Corpus (deterministic, synthesized in-process): 20,000 small HTML docs
(~1.2 KB) + ``--n-big`` oversized docs (``--big-mb`` MB of text each —
thousands of times the median, the FIXTURES.md tail shape).

Three part_id strategies, extraction otherwise identical at local[N],
with physical placement following part_id (repartition on it) so the
task layout IS the partition layout under test:

* ``off``          — one uniform url-hash stream for everything.
* ``salted``       — ``with_partition_key``: big docs re-keyed on an
                     independent hash stream over the full range.
                     Decorrelates bigs from any url-key clustering, but
                     collisions remain birthday-bounded: two of k bigs
                     share a partition with probability
                     ~1 - exp(-k^2/2n), and that task runs BOTH full
                     parses serially — the straggler.
* ``round_robin``  — ``spread_oversized``: rank the big subset, part_id
                     = rank % n. Guarantees <= ceil(k/n) bigs per
                     partition; the wall is ONE big parse.

History: round 3 routed bigs into a small DEDICATED range (25% of
partitions); this bench measured that design making collisions
near-certain (6 bigs over 8 salt buckets -> 2 in one task, 0.7x
"speedup" vs no salting at all) and it was replaced. docs/ROUND4.md §6.

The tool reports wall seconds per strategy (best of ``--passes``,
interleaved) plus the measured max-bigs-per-partition, so the collision
the numbers explain is in the output, not assumed. Numbers land in
BENCH/BASELINE.md's skew section.

Usage: python tools/skew_bench.py [--cpus 32] [--n-big 6] [--big-mb 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL_DOCS = 20_000
SMALL_SENTENCE = ("scan filter join hash merge order batch row column "
                  "vector data line small slow customer ")


def build_pages(spark, n_big: int, big_mb: int):
    """(url, html) pages: 20k small + n_big oversized, all HTML."""
    import pandas as pd

    from pdf_parser_spark.html.writer import render_html

    def synth(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did < 0:  # big doc: |did| selects the seed
                    text = SMALL_SENTENCE * (big_mb * 1_000_000
                                             // len(SMALL_SENTENCE))
                    rows.append({
                        "url": f"crawl://big/{-did}",
                        "html": bytearray(render_html(text, doc_id=-did)),
                    })
                else:
                    rows.append({
                        "url": f"crawl://doc/{did}",
                        "html": bytearray(render_html(
                            SMALL_SENTENCE * 16, doc_id=did)),
                    })
            yield pd.DataFrame(rows)

    ids = [(i,) for i in range(N_SMALL_DOCS)] + [(-(i + 1),)
                                                 for i in range(n_big)]
    docs = spark.createDataFrame(ids, "doc_id long")
    return (docs.repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(synth, "url string, html binary"))


def _keyed(pages, n: int, strategy: str):
    from pdf_parser_spark.engine import partitioning

    if strategy == "off":
        return partitioning.with_partition_key(pages, n, size_col=None)
    if strategy == "salted":
        return partitioning.with_partition_key(pages, n)
    if strategy == "round_robin":
        return partitioning.spread_oversized(pages, n)
    raise ValueError(strategy)


def run_mode(spark, pages, n: int, strategy: str) -> dict:
    """One extraction pass with physical task == part_id EXACTLY (RDD
    identity partitioner — ``DataFrame.repartition(n, col)`` HASHES the
    value, so distinct part_ids can merge into one task and blur the
    layout under test; acceptable in the product, not in the harness).
    Returns the job wall and the slowest task's kernel seconds (the
    straggler the strategies differ on)."""
    from pdf_parser_spark.extractor import extract_document

    placed = (_keyed(pages, n, strategy)
              .select("part_id", "url", "html").rdd
              .map(lambda r: (r["part_id"], (r["url"], r["html"])))
              .partitionBy(n, lambda k: k))

    def timed(part):
        t0 = time.time()
        cnt = 0
        for _pid, (url, html) in part:
            extract_document(url, bytes(html))
            cnt += 1
        if cnt:
            yield (time.time() - t0, cnt)

    t0 = time.time()
    per_task = placed.mapPartitions(timed).collect()
    wall = time.time() - t0
    return {"wall": wall,
            "max_task": max((t for t, _ in per_task), default=0.0)}


def big_doc_layout(spark, pages, n: int, strategy: str) -> dict:
    from pyspark.sql import functions as F

    from pdf_parser_spark.engine import partitioning

    per_part = (_keyed(pages, n, strategy)
                .where(F.length("html") > partitioning.DEFAULT_BIG_BYTES)
                .groupBy("part_id").count().collect())
    return {
        "big_parts": sorted(int(r.part_id) for r in per_part),
        "max_big_per_part": max(int(r["count"]) for r in per_part),
    }


STRATEGIES = ("off", "salted", "round_robin")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-big", type=int, default=6)
    ap.add_argument("--big-mb", type=int, default=4)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from pdf_parser_spark.engine.session import get_spark

    spark = get_spark("skew-bench", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n = args.cpus

    pages = build_pages(spark, args.n_big, args.big_mb).persist()
    pages.count()

    layout = {s: big_doc_layout(spark, pages, n, s) for s in STRATEGIES}
    runs: dict[str, list[dict]] = {s: [] for s in STRATEGIES}
    for _ in range(args.passes):          # interleave modes (host noise)
        for s in STRATEGIES:
            runs[s].append(run_mode(spark, pages, n, s))

    out = {
        "metric": "skew_stress_wall_seconds",
        "n_small": N_SMALL_DOCS,
        "n_big": args.n_big,
        "big_mb": args.big_mb,
        "cpus": n,
    }
    for s in STRATEGIES:
        out[s] = {
            "best_wall": round(min(r["wall"] for r in runs[s]), 3),
            "best_max_task": round(min(r["max_task"] for r in runs[s]), 3),
            "walls": [round(r["wall"], 3) for r in runs[s]],
            **layout[s],
        }
    out["straggler_speedup_round_robin_vs_off"] = round(
        min(r["max_task"] for r in runs["off"])
        / min(r["max_task"] for r in runs["round_robin"]), 3)
    print(json.dumps(out))
    _write_md(out)
    spark.stop()


def _write_md(out: dict) -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    rows = "\n".join(
        f"| {s} | {out[s]['max_big_per_part']} | "
        f"{out[s]['best_max_task']:.2f} | {out[s]['best_wall']:.2f} |"
        for s in STRATEGIES)
    with open(os.path.join(repo, "BENCH", "SKEW.md"), "w") as f:
        f.write(f"""# Skew stress — oversized-doc spreading (tools/skew_bench.py)

Corpus: {out['n_small']} small HTML docs (~1.2 KB) + {out['n_big']} docs
of {out['big_mb']} MB text each (heavy tail at ~{out['big_mb'] * 800}x
median), local[{out['cpus']}], physical task == part_id exactly (RDD
identity partitioner in the harness — DataFrame repartition(n, col)
HASHES the value and would merge distinct part_ids into shared tasks),
interleaved passes, best kept. The straggler metric is the slowest
task's kernel seconds: every co-located big doc adds one full
serialized parse to its task.

| strategy | max big docs / partition | best max-task (s) | best wall (s) |
|---|---|---|---|
{rows}

Straggler speedup round_robin vs off:
{out['straggler_speedup_round_robin_vs_off']}x on this corpus — but the
point is the VARIANCE, not the ratio: both hash strategies are
birthday-bounded (P[two bigs collide] ~ 1 - exp(-k^2/2n)), so which one
"wins" a given run is seed luck, while round_robin's ceil(k/n) bound is
deterministic. This bench also falsified the round-3 design (bigs in a
DEDICATED 25% salt range): 6 bigs over 8 salt buckets collided
near-certainly and measured 0.7x — salting made it WORSE
(docs/ROUND4.md §6). Current defaults: full-range independent hash
stream in `with_partition_key` (pure projection, no extra shuffle);
opt-in `spread_big=True` on the checkpointed job for heavy-tailed
corpora (one window over only the big subset). A doc too large for any
single task is the page-split path's job (engine/paged.py), not the
partitioner's.
""")


if __name__ == "__main__":
    main()
