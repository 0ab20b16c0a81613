"""Structured Streaming surface: continuous extraction over an append-only
pages directory (file source), watermarked windowed lineage, and a custom
stateful sessionizer (applyInPandasWithState)."""
