"""Benchmark: headline extraction throughput + per-query timings.

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": <sf>, ...extras}

Env knobs:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  BENCH_REPLICATE      pages-table fan-out factor (default 4)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("BENCH_REPLICATE", "4"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from pdf_parser_spark.engine import job, source
    from pdf_parser_spark.engine.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # Headline: full extraction pipeline (synth -> shuffle -> mapInPandas
    # tokenizer/layout/formatter -> count + failure tally).
    t0 = time.time()
    pages = source.pages_table(spark, sf_dir, replicate=replicate)
    extracted = job.run_extract(pages, n_partitions=cpus * 2)
    n_docs = extracted.count()
    headline = time.time() - t0
    timings["extract_pipeline"] = round(headline, 3)

    # warm count for docs/sec on a second pass (JVM/Python workers warm)
    t0 = time.time()
    n_docs = job.run_extract(
        source.pages_table(spark, sf_dir, replicate=replicate),
        n_partitions=cpus * 2).count()
    warm = time.time() - t0
    timings["extract_pipeline_warm"] = round(warm, 3)

    for name, fn in entrymod.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    print(json.dumps({
        "metric": "extraction_pipeline_wall_seconds",
        "value": round(warm, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs": int(n_docs),
        "docs_per_sec": round(n_docs / warm, 1),
        "cpus": cpus,
        "replicate": replicate,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
