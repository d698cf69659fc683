"""The extraction pipeline exposed as driver-checkable queries.

Byte-level extraction output is not SQL-expressible (the kernel is a
DOM parser), so these register WITHOUT oracle SQL — the driver records
the weaker rows-only check; byte-exactness is covered by the pinned
golden fixtures in tests/test_golden.py instead (FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ragflow_spark.operators.registry import register
from ragflow_spark.plans.pipeline import (
    assign_splits,
    extract_pages,
)
from ragflow_spark.sources.pages import synthesize_pages


@register("extract_pages_stats")
def extract_pages_stats(spark, sf_dir):
    """Full pipeline over pages synthesized from documents.parquet:
    per (content_type, parse_status, parse_code) counts + chunk and
    token totals. Deterministic for a given sf_dir."""
    pages = synthesize_pages(spark, sf_dir)
    staged = assign_splits(pages, n_splits=32, salt_factor=8, hot_hosts=None)
    ex = extract_pages(staged)
    return (
        ex.groupBy("content_type", "parse_status", "parse_code")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.coalesce("chunks", F.array()))).alias("n_chunks"),
            F.sum(F.length(F.coalesce("extracted_text", F.lit("")))).alias(
                "total_chars"
            ),
        )
    )


@register("extract_text_hashes")
def extract_text_hashes(spark, sf_dir):
    """Byte-stability surface: md5 of every extracted_text. Two runs
    of this query must hash-match exactly (the driver's
    order-insensitive value hash gives that for free)."""
    pages = synthesize_pages(spark, sf_dir)
    staged = assign_splits(pages, n_splits=32, salt_factor=8, hot_hosts=None)
    ex = extract_pages(staged)
    return ex.select(
        "url",
        "parse_code",
        F.md5(F.coalesce("extracted_text", F.lit(""))).alias("text_md5"),
        F.size(F.coalesce("chunks", F.array())).alias("n_chunks"),
    )
