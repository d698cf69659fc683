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
      SELECT doc_id, text, str_split(text, ' ') AS words FROM documents
      WHERE doc_id % 20 IN (14, 15, 16, 17)
    ), p AS (
      SELECT doc_id, text, words, len(words) AS n,
             greatest(8, len(words) // 6) AS per
      FROM w
    ), paras AS (
      SELECT doc_id,
        -- real empty signal: str_split('', ' ') is [''] so n is never
        -- 0; all-whitespace text is the case Python's split() maps to
        -- [] -> 'empty document body' (ADVICE r3). Otherwise assumes
        -- the synthesizer's non-empty single-space-separated contract.
        CASE WHEN length(trim(text)) = 0 THEN ['empty document body'] ELSE
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


@register(
    "extract_text_hashes_structured",
    oracle="""
    WITH w AS (
      SELECT doc_id, text, str_split(text, ' ') AS words FROM documents
      WHERE doc_id % 20 IN (11, 12)
    ), p AS (
      SELECT doc_id, text, words, len(words) AS n,
             greatest(8, len(words) // 6) AS per
      FROM w
    ), paras AS (
      SELECT doc_id,
        CASE WHEN length(trim(text)) = 0 THEN ['empty document body'] ELSE
          list_transform(
            range(least(6, cast(ceil(n * 1.0 / per) AS INT))),
            i -> array_to_string(words[i * per + 1 : (i + 1) * per], ' ')
          ) END AS ps
      FROM p
    ), book AS (
      SELECT doc_id,
             'Book ' || doc_id || chr(10) || array_to_string(
               list_transform(
                 range(len(ps)),
                 i -> 'Chapter ' || (i + 1) || chr(10) || ps[i + 1]
               ), chr(10)) AS t
      FROM paras WHERE doc_id % 20 = 11
    ), paper AS (
      SELECT doc_id,
             'Paper ' || doc_id || chr(10) || 'Abstract' || chr(10) || ps[1]
             || chr(10)
             || CASE WHEN len(ps) > 2 THEN array_to_string(
                  list_transform(
                    range(len(ps) - 2),
                    i -> (i + 1) || '. Section' || chr(10) || ps[i + 2]
                  ), chr(10)) || chr(10) ELSE '' END
             -- rtrim: the 80-char cut can land on a space, which the
             -- kernel's whitespace normalization strips
             || 'References' || chr(10) || '[1] '
             || rtrim(substr(ps[len(ps)], 1, 80)) AS t
      FROM paras WHERE doc_id % 20 = 12
    )
    SELECT doc_id, md5(t) AS text_md5 FROM book
    UNION ALL
    SELECT doc_id, md5(t) AS text_md5 FROM paper
    """,
)
def extract_text_hashes_structured(spark, sf_dir):
    """Second partial VALUE oracle for byte-level extraction (r3
    verdict item #6): the heading/book template (doc_id % 20 == 11,
    sources/pages.py:133-137 — h1 + per-paragraph h2 chapters) and the
    paper template (== 12, pages.py:138-146 — h1/Abstract/numbered
    sections/References with the last paragraph truncated to 80 chars)
    reduce to pure relational string assembly over documents.text, so
    their extracted bytes are SQL-reconstructible just like the plain
    routes. Together with extract_text_hashes_plain this pins ~30% of
    the byte surface to value oracles; the residue (entity/charset/
    malformed/whitespace/huge-node/table routes 0-10, 13 and the PDF
    routes 18-19) intentionally stays golden-pinned: those branches
    exist precisely because their outputs are NOT naive functions of
    the source text (charset transcoding, entity decode, tag
    recovery)."""
    pages = synthesize_pages(
        spark, sf_dir, n_partitions=spark.sparkContext.defaultParallelism
    )
    staged = assign_splits(pages, n_splits=32, salt_factor=8, hot_hosts=None)
    ex = extract_pages(staged)
    doc_id = F.regexp_extract("url", r"doc-(\d+)$", 1).cast("bigint")
    return (
        ex.withColumn("doc_id", doc_id)
        .filter((F.col("doc_id") % 20).isin(11, 12))
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
