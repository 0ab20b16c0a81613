"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship extraction pipeline at sf0.001.
``queries()``      — implemented operators (SURVEY.md §2) as
                     (spark, sf_dir) -> DataFrame callables.
``oracle_sql()``   — DuckDB-equivalent SQL per query (tables region nation
                     customer supplier part orders lineitem events
                     documents embeddings are pre-registered views).

The extraction queries use the render->parse ROUNDTRIP oracle: document
text is deterministically rendered to HTML/PDF bytes Spark-side, pushed
through the full tokenizer/layout/formatter pipeline, and the result must
equal the original text (whitespace-normalized) — so the oracle SQL is a
simple projection of documents.text while the Spark side exercises the
whole engine.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SF0001 = "/root/testdata/sf0.001"

_ROUNDTRIP_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("extracted", StringType()),
])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize the Common-Crawl-style pages table from
    sf0.001 documents, run the full extraction job (url-hash + skew-salted
    shuffle -> mapInPandas tokenizer/layout/formatter), return the
    extracted table."""
    from pdf_parser_spark.engine import job, source

    pages = source.pages_table(spark, SF0001)
    return job.run_extract(pages, n_partitions=16)


def _roundtrip_kernel(render):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf_parser_spark.extractor import extract_document

        for pdf in batches:
            rows = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"],
                                          pdf["lang"]):
                blob = render(str(text), int(doc_id), str(lang))
                r = extract_document(f"doc://{doc_id}", blob)
                rows.append({"doc_id": int(doc_id),
                             "extracted": r.body_text})
            yield pd.DataFrame(rows, columns=["doc_id", "extracted"])
    return kernel


def _q_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML path roundtrip: text -> boilerplate-wrapped HTML -> DOM walk +
    link-density strip -> text. Covers S2 (bytes source), HTML extractor."""
    from pdf_parser_spark.html.writer import render_html

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select("doc_id", "text", "lang").mapInPandas(
        _roundtrip_kernel(lambda t, i, l: render_html(t, i, l)),
        _ROUNDTRIP_SCHEMA)
    return out.select(
        "doc_id",
        F.trim(F.regexp_replace("extracted", r"\s+", " ")).alias("extracted"))


def _q_extract_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF path roundtrip: text -> constrained PDF bytes -> xref/stream
    tokenizer -> layout pipeline -> plain-text blocks. Covers S1/S2, A1-A5,
    P1-P8, O1-O4, E2/E3 plumbing."""
    from pdf_parser_spark.datagen.pages import render_pdf_doc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select("doc_id", "text", "lang").mapInPandas(
        _roundtrip_kernel(lambda t, i, l: render_pdf_doc(t, i)),
        _ROUNDTRIP_SCHEMA)
    return out.select(
        "doc_id",
        F.trim(F.regexp_replace("extracted", r"\s+", " ")).alias("extracted"))


def _pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pdf_parser_spark.engine import job, source

    pages = source.pages_table(spark, sf_dir)
    ext = job.run_extract(pages, n_partitions=16)
    return ext.withColumn(
        "doc_id",
        F.regexp_extract("url", r"/(\d+)$", 1).cast("long"))


def _q_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed pipeline: magic-byte routing (S2) + error ladder (E1):
    doc_id%20==0 -> malformed bytes -> error row; 1-5 -> PDF; else HTML."""
    return _pipeline(spark, sf_dir).select("doc_id", "doc_type", "ok")


def _q_token_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang token-count parity of extracted text vs source (A9-style
    summary aggregate over the extraction output)."""
    ext = _pipeline(spark, sf_dir)
    toks = ext.filter(F.col("ok")).select(
        "doc_id",
        F.size(F.split(F.trim("body_text"), r"\s+")).alias("n_tokens"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                     .select("doc_id", "lang")
    return (toks.join(F.broadcast(docs), "doc_id")
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("sum_tokens"))
            .select("lang", "n_docs", "sum_tokens"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 content hash groupBy (map-side partial agg;
    broadcast-free)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.groupBy(F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
            .agg(F.count("*").alias("n_copies"),
                 F.min("doc_id").alias("canonical_doc_id"))
            .select("text_hash", "n_copies", "canonical_doc_id"))


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics per document (text-analysis family): whitespace
    token count, distinct tokens, char count — all JVM-side built-ins."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_html_roundtrip": _q_extract_html,
        "extract_pdf_roundtrip": _q_extract_pdf,
        "pipeline_routing": _q_routing,
        "token_parity_by_lang": _q_token_parity,
        "dedup_exact": _q_dedup_exact,
        "text_stats": _q_text_stats,
    }


def oracle_sql() -> dict[str, str]:
    roundtrip = (
        "SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) "
        "AS extracted FROM documents"
    )
    return {
        "extract_html_roundtrip": roundtrip,
        "extract_pdf_roundtrip": roundtrip,
        # malformed rows carry a %PDF- magic prefix, so they route to the
        # pdf branch and fail there (error column, ok=false)
        "pipeline_routing": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 20 BETWEEN 0 AND 5 THEN 'pdf' "
            "     ELSE 'html' END AS doc_type, "
            "(doc_id % 20 <> 0) AS ok FROM documents"
        ),
        "token_parity_by_lang": (
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(len(string_split_regex(trim(text), '\\s+')) "
            "    * CASE WHEN doc_id % 500 = 0 AND doc_id <> 0 "
            "           THEN 50 ELSE 1 END) AS BIGINT) AS sum_tokens "
            "FROM documents WHERE doc_id % 20 <> 0 GROUP BY lang"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, count(*) AS n_copies, "
            "min(doc_id) AS canonical_doc_id FROM documents "
            "GROUP BY md5(text)"
        ),
        "text_stats": (
            "SELECT doc_id, "
            "len(string_split_regex(trim(text), '\\s+')) AS n_tokens, "
            "len(list_distinct(string_split_regex(trim(text), '\\s+'))) "
            "  AS n_distinct_tokens, "
            "length(text) AS n_chars FROM documents"
        ),
    }
