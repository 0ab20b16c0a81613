"""Page-exploded extraction + applyInPandas re-assembly must produce
byte-identical documents to the single-pass path."""

from tests.conftest import SF0001


def test_paged_equals_single_pass(spark):
    from pdf_parser_spark.engine import job, paged, source

    pages = source.pages_table(spark, SF0001)
    single = (job.run_extract(pages, n_partitions=8)
              .filter("doc_type = 'pdf' AND ok")
              .select("url", "text"))
    assembled = (paged.run_extract_paged(pages)
                 .filter("ok = 'true'")
                 .select("url", "text"))
    joined = single.alias("a").join(assembled.alias("b"), "url")
    n_single = single.count()
    assert n_single > 0
    assert joined.count() == n_single
    diff = joined.filter("a.text <> b.text")
    assert diff.count() == 0


def test_paged_multipage_doc(spark):
    import pandas as pd

    from pdf_parser_spark.datagen.pages import render_pdf_doc
    from pdf_parser_spark.engine import paged
    from pdf_parser_spark.extractor import extract_document

    text = " ".join(f"w{i}" for i in range(2500))
    blob = render_pdf_doc(text, 99)
    df = spark.createDataFrame(
        pd.DataFrame([{"url": "u99", "html": blob}]))
    got = paged.run_extract_paged(df).collect()[0]
    want = extract_document("u99", blob)
    assert got.n_pages == want.n_pages > 1
    assert got.text == want.text  # byte-identical across the shuffle
