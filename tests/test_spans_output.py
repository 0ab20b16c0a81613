"""Span-offset output contract (TESTDATA.md §5 'extracted' table)."""

from pyspark.sql import functions as F

from tests.conftest import SF0001


def test_spans_nested_column(spark):
    from pdf_parser_spark.engine import job, source

    pages = source.pages_table(spark, SF0001)
    ext = job.run_extract(pages, n_partitions=8, with_spans=True)
    pdf_rows = ext.filter("doc_type = 'pdf' AND ok").limit(5).collect()
    assert pdf_rows
    for row in pdf_rows:
        assert row.spans, row.url
        for s in row.spans:
            assert s.page >= 1
            assert s.length == len(s.text)
            if s.offset >= 0:
                # offsets index into the formatted text
                assert row.text[s.offset : s.offset + s.length] == s.text
            assert s.x1 >= s.x0 and s.y1 >= s.y0
            assert s.font and s.size > 0


def test_span_offsets_mostly_resolved(spark):
    from pdf_parser_spark.engine import job, source

    pages = source.pages_table(spark, SF0001)
    ext = job.run_extract(pages, n_partitions=8, with_spans=True)
    stats = (ext.filter("doc_type = 'pdf' AND ok")
             .select(F.explode("spans").alias("s"))
             .agg(F.count("*").alias("n"),
                  F.sum(F.when(F.col("s.offset") >= 0, 1).otherwise(0))
                  .alias("resolved")).collect()[0])
    assert stats.n > 0
    assert stats.resolved / stats.n > 0.99
