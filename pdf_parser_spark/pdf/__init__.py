"""Pure-Python PDF subsystem: constrained deterministic writer (fixtures)
and a from-scratch byte-stream tokenizer (xref/object/content-stream parse,
FlateDecode, font-metric advance -> span bboxes).

Replaces the reference's PyMuPDF/pdfplumber dependency (reference
core/page.py:480 ``page.get_text("dict")``, tables/detector.py:119-163)
with code that runs inside Arrow-vectorized pandas UDFs.
"""
