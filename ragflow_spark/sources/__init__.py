"""Deterministic synthetic sources (no external data — FIXTURES.md)."""

from ragflow_spark.sources.pages import synthesize_pages, render_page_html  # noqa: F401
from ragflow_spark.sources.pdfgen import make_pdf  # noqa: F401
