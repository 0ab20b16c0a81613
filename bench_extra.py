"""Round-6 measurement harness (guide §1: measure first).

``bench.py`` is FROZEN for driver measurement; this file holds the extra
discipline the optimization round needs:

* noop-sink isolation (guide §1.4): every query is timed with
  ``df.write.format("noop").mode("overwrite").save()`` so the FULL
  result (every column) is computed and the timing excludes collect /
  count column-pruning artifacts;
* interleaved reps + /proc/stat steal-discard + median-of-clean (the
  tools/scaling_bench.py discipline, applied per query) — this host has
  minutes-long co-tenant steal bursts that make single passes swing 2x;
* ``--plans DIR`` dumps ``.explain("formatted")`` per query (the
  plans/r06 before/after evidence).

Usage:
  python bench_extra.py [--sf /root/testdata/sf1.0] [--reps 3]
                        [--plans plans/r06 --suffix _before] [q1,q2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEAL_CLEAN_S = 3.0


def _steal_ticks() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="?", default="")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pdf_parser_spark.engine.session import get_spark

    spark = get_spark("bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in (args.queries.split(",") if args.queries else qs)
             if n]
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown query {n}")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for n in names:
            df = qs[n](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(args.plans, f"{n}{args.suffix}.txt"),
                      "w") as f:
                f.write(plan)
            print(f"plan written: {n}{args.suffix}")

    samples: dict[str, list[dict]] = {n: [] for n in names}
    for rep in range(args.reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{n}#{rep}")
            s0 = _steal_ticks()
            t0 = time.time()
            (qs[n](spark, args.sf)
             .write.format("noop").mode("overwrite").save())
            wall = time.time() - t0
            steal = (_steal_ticks() - s0) / 100.0
            samples[n].append({"wall": round(wall, 3),
                               "steal_s": round(steal, 2)})
            spark.sparkContext.setJobDescription(None)

    out = {}
    for n in names:
        ss = samples[n]
        clean = [s for s in ss if s["steal_s"] <= STEAL_CLEAN_S]
        pool = sorted(s["wall"] for s in (clean or ss))
        out[n] = {
            "median": pool[len(pool) // 2] if len(pool) % 2 else round(
                (pool[len(pool) // 2 - 1] + pool[len(pool) // 2]) / 2, 3),
            "min": pool[0],
            "n_clean": len(clean),
            "samples": ss,
        }
    print(json.dumps({"sf": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
