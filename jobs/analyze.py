"""Diagnostic CLI — the Spark analog of the reference's ``pdf-parser
analyze``/``info`` commands (reference cli.py:172-313): per-page layout
diagnostics (columns, blocks, tables, header/footer) for selected urls of
the pages table, plus corpus-level summary counts.

Usage:
  python jobs/analyze.py --sf-dir /root/testdata/sf0.001 [--url URL]
         [--page N] [--limit 3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--url", default=None,
                    help="analyze one url in depth")
    ap.add_argument("--page", type=int, default=None)
    ap.add_argument("--limit", type=int, default=3,
                    help="PDF docs to detail when --url not given")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdf_parser_spark.engine import job, source
    from pdf_parser_spark.engine.session import get_spark
    from pdf_parser_spark.extractor import parse_pdf_document
    from pdf_parser_spark.pdf.tokenizer import is_pdf

    spark = get_spark("analyze", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = source.pages_table(spark, args.sf_dir)

    # corpus summary (reference cli.py:151-159 totals)
    ext = job.run_extract(pages, n_partitions=args.cpus * 2)
    summary = ext.groupBy("doc_type", "ok").agg(
        F.count("*").alias("docs"),
        F.sum("n_pages").alias("pages"),
        F.sum("n_blocks").alias("blocks"),
        F.sum("n_tables").alias("tables")).orderBy("doc_type", "ok")
    print("== corpus summary ==")
    for r in summary.collect():
        print(f"  {r.doc_type:8s} ok={str(r.ok):5s} docs={r.docs:6d} "
              f"pages={r.pages or 0:6d} blocks={r.blocks or 0:7d} "
              f"tables={r.tables or 0:5d}")

    # per-page detail (reference cli.py:270-309)
    cond = (F.col("url") == args.url) if args.url else F.lit(True)
    sample = (pages.where(cond).limit(200).collect()
              if args.url else pages.limit(200).collect())
    shown = 0
    for row in sample:
        data = bytes(row.html)
        if not is_pdf(data):
            continue
        try:
            doc = parse_pdf_document(row.url, data)
        except Exception as e:
            print(f"\n== {row.url}: load error: {e}")
            continue
        print(f"\n== {row.url} ({len(doc.pages)} pages) ==")
        for pg in doc.pages:
            if args.page and pg.page_number != args.page:
                continue
            print(f"  page {pg.page_number}: {len(pg.columns)} column(s), "
                  f"{len(pg.blocks)} blocks, {len(pg.tables)} tables")
            if pg.header:
                print(f"    header: {pg.header!r}")
            if pg.footer:
                print(f"    footer: {pg.footer!r}")
            for col in pg.columns:
                print(f"    col {col.index}: x=[{col.bbox.x0:.0f},"
                      f"{col.bbox.x1:.0f}] {len(col.blocks)} blocks")
            for b in pg.blocks[:5]:
                print(f"    [{b.block_type:9s}] "
                      f"y={b.bbox.y0:.0f} {b.text[:48]!r}")
        shown += 1
        if not args.url and shown >= args.limit:
            break
    spark.stop()


if __name__ == "__main__":
    main()
