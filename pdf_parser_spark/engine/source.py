"""Sources: the Common-Crawl-style pages table.

In production this is an Iceberg table scan (``spark.read.format("iceberg")
.load(...)`` with snapshot-id predicates — no jar in this sandbox, see
SURVEY.md §7.0); here the table is synthesized distributedly from the
driver's documents.parquet via mapInPandas, one deterministic page row per
document (datagen.pages rules).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType, TimestampType,
)

from ..datagen.pages import build_pages_pdf

PAGES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

REPLICA_STRIDE = 10_000_000  # doc_id offset per replica (keeps urls unique)


def _synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = build_pages_pdf(pdf)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out["html"] = out["html"].map(bytes)
        yield out[[f.name for f in PAGES_SCHEMA]]


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages_table(spark: SparkSession, sf_dir: str,
                replicate: int = 1,
                n_partitions: int | None = None) -> DataFrame:
    """Deterministic pages table. ``replicate`` > 1 fans each document out
    to N distinct urls (benchmark scaling knob; doc_id offset by a stride
    per replica so synthesis stays deterministic per row).

    The documents parquet is a single small file => a single scan
    partition; synthesis (PDF/HTML rendering) is CPU work, so spread it
    across the cluster FIRST with a cheap shuffle of the narrow
    (doc_id, text, lang) rows — the expensive html bytes are materialized
    post-shuffle, never moved."""
    docs = read_documents(spark, sf_dir)
    if replicate > 1:
        docs = (
            docs.withColumn(
                "_rep", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))))
            .withColumn(
                "doc_id",
                (F.col("doc_id") + F.col("_rep") * F.lit(REPLICA_STRIDE))
                .cast("long"))
            .drop("_rep")
        )
    if n_partitions is None:
        # one task wave: python-worker handoff costs ~10-15 ms per task
        # serialized on the driver, so extra waves buy balance but pay a
        # fixed tax; with uniform synth cost one wave wins.
        n_partitions = spark.sparkContext.defaultParallelism
    return (docs.select("doc_id", "text", "lang")
            .repartition(n_partitions, F.col("doc_id"))
            .mapInPandas(_synth_batches, PAGES_SCHEMA))
