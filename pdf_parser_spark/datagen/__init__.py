"""Deterministic synthesis of the Common-Crawl-style pages table
(url, warc_ts, html, text, lang) from the driver's documents.parquet —
per BASELINE.json input_hint. Seeded, no wall clock, no network."""
