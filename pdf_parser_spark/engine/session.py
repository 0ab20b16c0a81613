"""SparkSession factory with scale-aware defaults.

Single place for the configs that matter at 100 TB: AQE (runtime
coalescing + skew splitting), Arrow transport for the pandas UDF boundary,
small Arrow batches (binary page bodies can be MBs — a 10k-row default
batch would blow executor memory), and shuffle partitions sized to cores
locally (on a real cluster: 2-3x total cores via --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch sizing (r6, measured): every mapInPandas/pandas-UDF batch
# pays a fixed JVM<->Python cost (Arrow IPC framing + pandas frame
# construction, ~1-2 ms); at 64 rows that tax dominated small-row
# kernels (media_features 2.9 s -> 1.0 s, ann_ivf 1.9 s -> 0.9 s at
# sf1.0 just from raising it). 1024 rows keeps the worst batch bounded:
# the heaviest rows are skew-fixture pages (~30 KB html) -> ~30 MB per
# batch per worker. On Spark 4 the byte-denominated knob
# (spark.sql.execution.arrow.maxBytesPerBatch) is the production-grade
# guard for corpora whose single documents reach MBs.
ARROW_BATCH_ROWS = 1024


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "pdf-parser-spark",
              cpus: int | None = None) -> SparkSession:
    cpus = cpus or default_parallelism()
    return (
        SparkSession.builder
        .appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # INT64 timestamps (Iceberg forbids INT96, and INT96 parquet
        # columns carry no footer stats — catalog delete_where needs
        # them for warc_ts partition-aligned file pruning)
        .config("spark.sql.parquet.outputTimestampType",
                "TIMESTAMP_MICROS")
        # UTC pin (r6, ADVICE): the catalog's bounds classification
        # treats naive datetimes as UTC epoch micros (matching parquet
        # footer stats), but Spark's rewrite filters interpret naive
        # predicate values in the SESSION timezone — on a non-UTC host
        # the two would disagree and a ts-predicate delete could
        # drop/keep the wrong files. (No-op on this UTC host.)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
