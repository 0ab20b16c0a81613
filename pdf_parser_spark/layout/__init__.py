"""Layout algebra: span -> line -> block -> column -> paragraph -> table.

A from-scratch re-implementation of the reference's layout semantics
(karanvora2599/PDF_Parser core/page.py, layout/*.py, tables/detector.py)
designed to run per-document inside Arrow pandas UDFs. Every threshold and
coordinate-frame quirk is replicated deliberately (SURVEY.md §1.4) so
extracted text is byte-identical.
"""
