"""HTML subsystem: stdlib-only DOM walk with text-density / link-density
boilerplate scoring (readability/trafilatura-style; north-star addition —
the reference parses only PDFs), plus a deterministic fixture writer."""
