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

# Keep Arrow batches small: html is a binary column with a deliberate
# heavy tail (FIXTURES.md skew fixture); 10000-row batches of 1 MB docs
# would be ~10 GB per batch.
ARROW_BATCH_ROWS = 64


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
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
