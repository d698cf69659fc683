"""The extraction pipeline exposed as driver-checkable queries.

Byte-level extraction output is not SQL-expressible (the kernel is a
DOM parser), so extract_text_hashes registers WITHOUT oracle SQL — the
driver records the weaker rows-only check; byte-exactness is covered
by the pinned golden fixtures in tests/test_golden.py (FIXTURES.md §2).
extract_pages_stats, by contrast, IS oracle-able: content_type and
parse outcome are pure modular arithmetic on doc_id (the page
synthesizer routes templates by doc_id % 20, sources/pages.py: t in
{18,19} -> pdf, t == 9 -> empty payload since 20k+9 is always odd;
every other template parses ok), so the count-level mix is mirrored
in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ragflow_spark.kernels.sniff import CODE_EMPTY_PAYLOAD, CODE_OK
from ragflow_spark.operators.registry import register
from ragflow_spark.plans.pipeline import (
    assign_splits,
    extract_pages,
)
from ragflow_spark.sources.pages import synthesize_pages


@register(
    "extract_pages_stats",
    oracle=f"""
    SELECT CASE WHEN doc_id % 20 IN (18, 19) THEN 'pdf'
                WHEN doc_id % 20 = 9 THEN 'empty'
                ELSE 'html' END AS content_type,
           CASE WHEN doc_id % 20 = 9 THEN 'failed' ELSE 'ok' END
             AS parse_status,
           CASE WHEN doc_id % 20 = 9 THEN {CODE_EMPTY_PAYLOAD}
                ELSE {CODE_OK} END AS parse_code,
           count(*)::BIGINT AS n_docs
    FROM documents
    GROUP BY 1, 2, 3
    """,
)
def extract_pages_stats(spark, sf_dir):
    """Full pipeline over pages synthesized from documents.parquet:
    per (content_type, parse_status, parse_code) counts. The oracle
    recomputes the mix arithmetically from the synthesizer's
    doc_id % 20 routing — a real end-to-end check that every page
    lands in the right parser with the right outcome. Chunk/char
    totals are covered per-url by extract_text_hashes + goldens."""
    pages = synthesize_pages(
        spark, sf_dir, n_partitions=spark.sparkContext.defaultParallelism
    )
    staged = assign_splits(pages, n_splits=32, salt_factor=8, hot_hosts=None)
    ex = extract_pages(staged)
    return ex.groupBy("content_type", "parse_status", "parse_code").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "extract_text_hashes_plain",
    oracle="""
    WITH w AS (
      SELECT doc_id, str_split(text, ' ') AS words FROM documents
      WHERE doc_id % 20 IN (14, 15, 16, 17)
    ), p AS (
      SELECT doc_id, words, len(words) AS n,
             greatest(8, len(words) // 6) AS per
      FROM w
    ), paras AS (
      SELECT doc_id,
        CASE WHEN n = 0 THEN ['empty document body'] ELSE
          list_transform(
            range(least(6, cast(ceil(n * 1.0 / per) AS INT))),
            i -> array_to_string(words[i * per + 1 : (i + 1) * per], ' ')
          ) END AS ps
      FROM p
    )
    SELECT doc_id, md5(array_to_string(ps, chr(10))) AS text_md5 FROM paras
    """,
)
def extract_text_hashes_plain(spark, sf_dir):
    """VALUE oracle for a byte-level extraction subset: the plain
    article templates (doc_id % 20 in 14..17, sources/pages.py:149-151
    — header + <article> paragraphs + footer, no entity/charset/
    malformed variation) extract to exactly the newline-joined
    paragraph regrouping of documents.text, so the md5 of the
    extracted bytes is reconstructible in pure SQL (str_split ->
    _paragraphs regrouping: per = max(8, n_words // 6), first 6
    paragraphs -> join with \\n -> md5). This runs the REAL pipeline —
    synthesize -> sniff -> DOM parse -> boilerplate strip -> normalize
    — and pins ~20% of its byte output to a SQL value oracle; the
    remaining templates stay golden-pinned (tests/test_golden.py) and
    rows-only in `extract_text_hashes`."""
    pages = synthesize_pages(
        spark, sf_dir, n_partitions=spark.sparkContext.defaultParallelism
    )
    staged = assign_splits(pages, n_splits=32, salt_factor=8, hot_hosts=None)
    ex = extract_pages(staged)
    doc_id = F.regexp_extract("url", r"doc-(\d+)$", 1).cast("bigint")
    return (
        ex.withColumn("doc_id", doc_id)
        .filter((F.col("doc_id") % 20).isin(14, 15, 16, 17))
        .select(
            "doc_id",
            F.md5(F.coalesce("extracted_text", F.lit(""))).alias("text_md5"),
        )
    )


@register("extract_text_hashes")
def extract_text_hashes(spark, sf_dir):
    """Byte-stability surface: md5 of every extracted_text. Two runs
    of this query must hash-match exactly (the driver's
    order-insensitive value hash gives that for free)."""
    pages = synthesize_pages(
        spark, sf_dir, n_partitions=spark.sparkContext.defaultParallelism
    )
    staged = assign_splits(pages, n_splits=32, salt_factor=8, hot_hosts=None)
    ex = extract_pages(staged)
    return ex.select(
        "url",
        "parse_code",
        F.md5(F.coalesce("extracted_text", F.lit(""))).alias("text_md5"),
        F.size(F.coalesce("chunks", F.array())).alias("n_chunks"),
    )
