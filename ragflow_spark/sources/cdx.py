"""Common-Crawl CDXJ index ingestion — the capture index a crawler
publishes next to its WARC segments (one line per capture:
``<urlkey> <timestamp14> <json>``), and what a fetch planner reads to
decide which WARC ranges to pull.

Like sources/media_store.py, the driver's testdata has no CDX files,
so this module materializes one deterministically from the documents
table ONCE per sf_dir (a distributed Spark job, cached under
``.bench/cdx`` or ``$SPARK_GRAFT_CDX_DIR``), and the reader then
exercises the real plumbing: text scan -> split -> ``from_json`` —
map-only, no Exchange, one (splittable) text file per task at crawl
scale.

Record arithmetic (both engines can rebuild it, so the fetch-plan
query is driver-value-checkable end to end THROUGH the file):

* url/host/timestamp: sources/pages.py conventions (``url_for``,
  EPOCH + 137 s * doc_id);
* urlkey: SURT form — host labels reversed and comma-joined, then
  ``)/path``;
* digest: md5 of the document text (so exact-dup docs collide, tying
  the index to the dedup operators);
* length: ``200 + (doc_id % 13) * 37`` bytes; filename:
  ``crawl-{doc_id % 8:05d}.warc.gz``;
* offset: running sum of lengths within a file in doc_id order
  (records are contiguous — ``max(offset + length) == sum(length)``
  per file, pinned by pytest).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

CACHE_ENV = "SPARK_GRAFT_CDX_DIR"

N_WARC_FILES = 8

CDX_JSON_SCHEMA = (
    "url string, digest string, length string, offset string, filename string"
)


def cache_path(sf_dir: str) -> str:
    """Cache dir for sf_dir's CDXJ lines; keyed by corpus stamp
    (sources/cachefs.stamped_cache_path) so regenerated or
    same-basename corpora never serve each other's index."""
    from ragflow_spark.sources.cachefs import stamped_cache_path

    return stamped_cache_path(CACHE_ENV, "cdx", "cdx", sf_dir)


def _render_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import datetime as dt
    import json

    from ragflow_spark.sources.pages import EPOCH, host_for, url_for

    for pdf in batches:
        lines = []
        for doc_id, digest, offset in zip(
            pdf["doc_id"].astype("int64"),
            pdf["digest"],
            pdf["offset"].astype("int64"),
        ):
            doc_id = int(doc_id)
            host = host_for(doc_id)
            urlkey = ",".join(reversed(host.split("."))) + f")/doc-{doc_id}"
            ts = (EPOCH + dt.timedelta(seconds=doc_id * 137)).strftime(
                "%Y%m%d%H%M%S"
            )
            meta = {
                "url": url_for(doc_id),
                "digest": digest,
                "length": str(200 + (doc_id % 13) * 37),
                "offset": str(int(offset)),
                "filename": f"crawl-{doc_id % N_WARC_FILES:05d}.warc.gz",
            }
            lines.append(f"{urlkey} {ts} {json.dumps(meta, sort_keys=True)}")
        yield pd.DataFrame({"value": lines})


def cdx_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) and return the CDXJ text directory for
    sf_dir. Generation is a distributed map plus one window for the
    within-file running offset — a one-time indexing job, exactly what
    a crawler's indexer runs per segment."""
    from pyspark.sql import Window

    from ragflow_spark.sources.cachefs import atomic_materialize

    def write(tmp: str) -> None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.md5("text").alias("digest")
        )
        w = (
            Window.partitionBy(F.col("doc_id") % N_WARC_FILES)
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        length = 200 + (F.col("doc_id") % 13) * 37
        staged = docs.withColumn(
            "offset", F.coalesce(F.sum(length).over(w), F.lit(0))
        )
        staged.mapInPandas(_render_lines, schema="value string").write.mode(
            "overwrite"
        ).text(tmp)

    return atomic_materialize(cache_path(sf_dir), write)


def read_cdx_index(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ lines -> typed capture rows: (urlkey, ts14, url, digest,
    length, offset, filename). Text scan + split + from_json — pure
    map work, JVM-side, no Exchange (plan-shape-tested)."""
    v = F.col("value")
    parts = F.split(v, " ", 3)
    meta = F.from_json(parts.getItem(2), CDX_JSON_SCHEMA)
    return spark.read.text(path).select(
        parts.getItem(0).alias("urlkey"),
        parts.getItem(1).alias("ts14"),
        meta["url"].alias("url"),
        meta["digest"].alias("digest"),
        meta["length"].cast("long").alias("length"),
        meta["offset"].cast("long").alias("offset"),
        meta["filename"].alias("filename"),
    )
