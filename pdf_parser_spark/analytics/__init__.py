"""Web-scale corpus analytics: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard), embedding similarity search (brute-force +
LSH-bucketed ANN), text analysis (language-ID, quality scoring, token
counting, fingerprinting), and multimodal-column plumbing.

Everything stays JVM-side (built-in pyspark.sql.functions, higher-order
array lambdas) except where Python is genuinely required (multimodal
decode stubs) — no per-row Python UDFs anywhere.
"""
