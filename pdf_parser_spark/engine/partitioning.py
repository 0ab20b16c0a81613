"""Explicit partitioning for the extraction shuffle (north-rule item:
"partitioning / shuffle / skew handled explicitly").

Strategy (SURVEY.md §2.12 / §4.2):

* stable partition key: ``pmod(xxhash64(url), n)`` — deterministic across
  runs and cluster sizes, which is what makes the checkpoint manifest
  (engine.checkpoint) resumable: partition identity is a property of the
  DATA, not of the scheduler.
* size-bucket skew salting: documents whose ``length(html)`` exceeds
  ``big_bytes`` are routed to dedicated partitions, one salt per doc
  (pmod of hash over a separate range), so one 100-1000x-median document
  (the FIXTURES.md heavy tail) never stalls a partition full of small
  docs. At 100 TB this is the difference between a 2h job and a 2h job
  with one 14h straggler task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Local default tuned to the synthetic tail (median doc ~1 KB, skewed docs
# ~50x). On a real crawl: 4-16 MB.
DEFAULT_BIG_BYTES = 16_000


def with_partition_key(df: DataFrame, n_partitions: int,
                       url_col: str = "url",
                       size_col: str | None = "html",
                       big_bytes: int = DEFAULT_BIG_BYTES,
                       big_share: float = 0.25) -> DataFrame:
    """Add a stable ``part_id`` column in [0, n_partitions).

    Small docs hash over the first (1 - big_share) of the range; oversized
    docs spread over the remaining dedicated salt range so they co-locate
    only with other big docs (and spread as widely as possible).
    """
    n_small = max(1, int(n_partitions * (1.0 - big_share)))
    n_big = max(1, n_partitions - n_small)
    small_key = F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_small))
    if size_col is None:
        return df.withColumn("part_id", small_key.cast("int"))
    big_key = (F.lit(n_small)
               + F.pmod(F.xxhash64(F.col(url_col), F.lit(1)), F.lit(n_big)))
    is_big = F.length(F.col(size_col)) > F.lit(big_bytes)
    return df.withColumn(
        "part_id",
        F.when(is_big, big_key).otherwise(small_key).cast("int"),
    )


def repartition_for_extract(df: DataFrame, n_partitions: int,
                            url_col: str = "url") -> DataFrame:
    """Physical placement for the extraction stage: hash the
    HIGH-CARDINALITY url, not part_id. Hashing a low-cardinality key (48
    distinct part_ids) into 64 buckets occupies only ~31 of them with 5x
    row imbalance (balls-in-bins); url hashing fills every bucket
    uniformly. part_id remains the logical manifest key — commit/resume
    correctness needs the COLUMN to be stable, not task alignment
    (write.partitionBy routes rows to part_id dirs from any task)."""
    return df.repartition(n_partitions, F.col(url_col))


def repartition_by_key(df: DataFrame, n_partitions: int) -> DataFrame:
    """Deprecated alias kept for the checkpoint path; see
    repartition_for_extract."""
    return repartition_for_extract(df, n_partitions)
