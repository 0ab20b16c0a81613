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

    # Headline: scan -> extract (fused kernel, one Arrow hop, one wave —
    # the production plan shape; see engine.job.run_extract_fused).
    from pyspark.sql import functions as F

    def docs_replicated():
        docs = source.read_documents(spark, sf_dir)
        if replicate > 1:
            docs = (docs.withColumn(
                        "_rep", F.explode(F.sequence(F.lit(0),
                                                     F.lit(replicate - 1))))
                    .withColumn("doc_id", (F.col("doc_id")
                                           + F.col("_rep") * 10_000_000)
                                .cast("long"))
                    .drop("_rep"))
        return docs

    t0 = time.time()
    n_docs = job.run_extract_fused(docs_replicated(),
                                   n_partitions=cpus).count()
    timings["extract_pipeline"] = round(time.time() - t0, 3)

    # warm passes (python workers + JIT warm); the BEST of three is the
    # reported headline — this VM's physical host has co-tenant load
    # phases (minutes-long /proc/stat steal bursts) that make single
    # warm passes swing 2x run-to-run
    walls = []
    for _ in range(3):
        t0 = time.time()
        n_docs = job.run_extract_fused(docs_replicated(),
                                       n_partitions=cpus).count()
        walls.append(time.time() - t0)
    warm = min(walls)
    timings["extract_pipeline_warm"] = round(warm, 3)
    timings["extract_pipeline_warm_all"] = [round(w, 3) for w in walls]

    # the two-stage variant (materialized pages table -> extract) for
    # comparison with the checkpointed job's plan shape
    t0 = time.time()
    job.run_extract(source.pages_table(spark, sf_dir, replicate=replicate),
                    n_partitions=cpus * 2).count()
    timings["extract_two_stage"] = round(time.time() - t0, 3)

    # per-query best-of-2 (same host-noise rationale as the headline;
    # the second pass also reports warm-plan cost rather than first-run
    # codegen compilation)
    for _ in range(2):
        for name, fn in entrymod.queries().items():
            t0 = time.time()
            fn(spark, sf_dir).count()
            wall = round(time.time() - t0, 3)
            if name not in timings or wall < timings[name]:
                timings[name] = wall

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
