"""JSON-lines pages ingestion: crawler/export format -> pages table.

Real crawls land in three wire formats: WARC segments (sources/warc.py),
WET extracted-text segments (read_wet_documents), and JSONL dumps (one
page object per line — scrapy/heritrix exports, CC-News derivative
sets). This reader maps JSONL to the same pages schema the extractor
consumes; html arrives base64-encoded (JSON cannot carry raw bytes) and
is decoded JVM-side (unbase64 — no Python in the path).

Scale shape: spark.read.json with an EXPLICIT schema (no runtime schema
inference pass over 100 TB); .json.gz files are non-splittable like
WARC — one file per task — while uncompressed/zstd JSONL splits by
maxPartitionBytes. Malformed lines follow error-as-row: PERMISSIVE mode
keeps them as null-url rows counted by the caller, never task failures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

JSONL_SCHEMA = (
    "url string, warc_ts string, html_b64 string, text string, lang string"
)


def read_jsonl_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """`.jsonl(.gz)` page dumps -> pages DataFrame (url, warc_ts,
    html, text, lang) — the extractor's input contract."""
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .json(path_glob)
    )
    # unbase64(null) stays null — a page with no html must round-trip
    # as null, not b'' (ADVICE r3: the old coalesce conflated the two)
    return raw.select(
        "url",
        F.to_timestamp("warc_ts").alias("warc_ts"),
        F.unbase64("html_b64").alias("html"),
        "text",
        "lang",
    )


def write_jsonl_pages(pages: DataFrame, path: str) -> None:
    """pages -> JSONL dump (html base64-encoded) — the round-trip
    writer used by fixtures/tests and for handing corpora to
    non-Spark consumers."""
    (
        pages.select(
            "url",
            # microsecond precision: crawl timestamps can carry
            # sub-second parts; to_timestamp parses the fraction back
            F.date_format(
                "warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
            ).alias("warc_ts"),
            F.base64("html").alias("html_b64"),
            "text",
            "lang",
        )
        .write.mode("overwrite")
        .json(path)
    )
