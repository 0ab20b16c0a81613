"""Spark-side engine: session config, url-hash + size-salted partitioning,
the mapInPandas extraction job, parquet-emulated snapshot/manifest
checkpointing, and per-partition lineage."""
