"""WARC segment ingestion: .warc(.gz) files -> the pages table.

Spark-first shape for Common Crawl scale: each `.warc.gz` segment
(~1 GB, gzip -> not splittable) is one task — exactly how CC is
processed on real clusters. `binaryFile` gives (path, content) rows;
a mapInPandas pass runs the pure kernel `parse_warc` per segment and
explodes records into pages-schema rows. 10^5 segments = 10^5 tasks;
no shuffle, no driver-side file loop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ragflow_spark.sources.pages import PAGES_SCHEMA

PAGES_FROM_WARC_SCHEMA = PAGES_SCHEMA + ", warc_path string, n_skipped int"


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ragflow_spark.kernels.warcx import parse_warc

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            records, skipped = parse_warc(bytes(content))
            for r in records:
                rows.append(
                    (
                        r.url,
                        None if r.warc_ts is None
                        else r.warc_ts.replace(tzinfo=None),
                        r.payload,
                        None,  # text: WARC carries no conversion text
                        None,  # lang: unknown at ingest
                        path,
                        skipped,
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "url", "warc_ts", "html", "text", "lang",
                "warc_path", "n_skipped",
            ],
        )


def read_warc_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """`.warc` / `.warc.gz` files under path_glob -> pages DataFrame
    (+ per-record provenance columns warc_path, n_skipped)."""
    files = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_batches, schema=PAGES_FROM_WARC_SCHEMA)


WET_DOCS_SCHEMA = (
    "url string, warc_ts timestamp, text string, wet_path string, "
    "n_skipped int"
)


def _parse_wet_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ragflow_spark.kernels.warcx import parse_warc

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            records, skipped = parse_warc(
                bytes(content), record_types=("conversion",)
            )
            for r in records:
                rows.append(
                    (
                        r.url,
                        None if r.warc_ts is None
                        else r.warc_ts.replace(tzinfo=None),
                        r.payload.decode("utf-8", "replace"),
                        path,
                        skipped,
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=["url", "warc_ts", "text", "wet_path", "n_skipped"],
        )


def read_wet_documents(spark: SparkSession, path_glob: str) -> DataFrame:
    """`.wet` / `.wet.gz` segments (Common Crawl's extracted-text
    sibling of WARC: WARC conversion records with text/plain payloads)
    -> documents-shaped rows. Same one-non-splittable-segment-per-task
    layout as `read_warc_pages`, no shuffle — the ingestion edge for
    the training-data ops (dedup / quality / token / fingerprint
    queries) when the corpus arrives already extracted."""
    files = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_wet_batches, schema=WET_DOCS_SCHEMA)
