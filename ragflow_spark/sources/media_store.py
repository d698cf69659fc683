"""Materialized binary media column for the multimodal operators.

At lake scale the media payload IS a column of the table being scanned
(Common-Crawl-style stores keep page/media bytes next to metadata).
The driver's synthetic testdata has no binary column, so this module
materializes one — `encode_media(doc_id)` per documents row — into a
parquet cache ONCE per sf_dir, and every multimodal query then reads
the payload from the scan: parquet BINARY -> Arrow -> mapInPandas
decode, the exact plumbing a real corpus would exercise (round-1
review: re-synthesizing payloads inside the UDF bypassed the scan
path; this closes that gap).

Generation is itself a distributed map (mapInPandas over doc_ids), not
a driver loop, so the same code would backfill a media column at any
scale.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

CACHE_ENV = "SPARK_GRAFT_MEDIA_DIR"

_GEN_SCHEMA = "doc_id bigint, media binary"


def _encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ragflow_spark.kernels.media import encode_media

    for pdf in batches:
        ids = pdf["doc_id"].astype("int64")
        yield pd.DataFrame(
            {"doc_id": ids, "media": [encode_media(int(d)) for d in ids]}
        )


def cache_path(sf_dir: str) -> str:
    """Cache location for sf_dir's media parquet; keyed by corpus
    stamp (sources/cachefs.stamped_cache_path) so two corpora whose
    directories share a basename (or a corpus regenerated in place)
    can never silently serve each other's payload column."""
    from ragflow_spark.sources.cachefs import stamped_cache_path

    return stamped_cache_path(
        CACHE_ENV, "media", "media", sf_dir, suffix=".parquet"
    )


def media_parquet(spark, sf_dir: str) -> str:
    """Path of the (doc_id BIGINT, media BINARY) parquet for sf_dir,
    materializing it on first use. Cache root is $SPARK_GRAFT_MEDIA_DIR
    or <repo>/.bench/media (gitignored)."""
    from ragflow_spark.sources.cachefs import atomic_materialize

    def write(tmp: str) -> None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
        docs.mapInPandas(_encode_batches, schema=_GEN_SCHEMA).write.mode(
            "overwrite"
        ).parquet(tmp)

    return atomic_materialize(cache_path(sf_dir), write)


def media_table(spark, sf_dir: str):
    """The media table as a DataFrame — payloads come from the parquet
    scan, so downstream plans show `media: binary` in ReadSchema."""
    return spark.read.parquet(media_parquet(spark, sf_dir))
