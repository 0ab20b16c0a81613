"""Sinks: ASCII/markdown table rendering and plain-text/markdown/JSON
document formatters — byte-level parity with the reference's
tables/ascii_converter.py and output/formatter.py."""
