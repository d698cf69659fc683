"""Multimodal operators: opaque binary media columns over Spark.

The media payloads live in a parquet BINARY column (materialized once
per sf_dir by sources/media_store.py — at lake scale the column is
simply part of the table) and every query decodes FROM THE SCAN:
parquet binary -> Arrow batch -> mapInPandas, the real multimodal
plumbing. The fake codec family in kernels/media.py (real codecs are
stubbed — container has no image/audio libs) makes every decoded value
integer arithmetic on doc_id that the DuckDB oracle recomputes exactly.

All three queries keep the 100 TB shape: decode is map-only over the
scan (no shuffle), feature outputs are small typed columns, and the
binary payload never enters a shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import functions as F

from ragflow_spark.operators.registry import register
from ragflow_spark.sources.media_store import media_table

FRAME_EVERY = 3

_MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, decode_code int, width int, "
    "height int, n_frames int, n_samples int, n_bytes bigint"
)


def _decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ragflow_spark.kernels.media import decode_media

    for pdf in batches:
        rows = []
        for d, payload in zip(pdf["doc_id"].astype("int64"), pdf["media"]):
            m = decode_media(payload)
            rows.append(
                (
                    int(d),
                    m.media_type,
                    m.decode_code,
                    m.width,
                    m.height,
                    m.n_frames,
                    m.n_samples,
                    m.n_bytes,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "media_type",
                "decode_code",
                "width",
                "height",
                "n_frames",
                "n_samples",
                "n_bytes",
            ],
        )


@register(
    "media_metadata",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
                ELSE 'audio' END AS media_type,
           0 AS decode_code,
           CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 48
                WHEN 1 THEN 8 + doc_id % 16 ELSE 0 END AS width,
           CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id // 7) % 32
                WHEN 1 THEN 8 + (doc_id // 5) % 16 ELSE 0 END AS height,
           CASE doc_id % 3 WHEN 1 THEN 4 + doc_id % 12 ELSE 0 END AS n_frames,
           CASE doc_id % 3 WHEN 2 THEN 1000 + doc_id % 500 ELSE 0
                END AS n_samples,
           CASE doc_id % 3
                WHEN 0 THEN 8 + (16 + doc_id % 48) * (16 + (doc_id // 7) % 32)
                WHEN 1 THEN 10 + (4 + doc_id % 12) * (8 + doc_id % 16)
                            * (8 + (doc_id // 5) % 16)
                ELSE 8 + 2 * (1000 + doc_id % 500) END AS n_bytes
    FROM documents
    """,
)
def media_metadata(spark, sf_dir):
    """binary payload -> typed metadata row, vectorized decode. The
    payload comes off the parquet scan (ReadSchema shows media:binary,
    plan-shape-tested); the oracle recomputes every field
    arithmetically from doc_id — a full round-trip check of
    encode -> parquet BINARY -> Arrow -> decode plumbing."""
    d = media_table(spark, sf_dir).select("doc_id", "media")
    return d.mapInPandas(_decode_meta, schema=_MEDIA_SCHEMA)


def _thumb_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ragflow_spark.kernels.media import decode_media, thumbnail_2x

    for pdf in batches:
        rows = []
        for d, payload in zip(pdf["doc_id"].astype("int64"), pdf["media"]):
            m = decode_media(payload)
            if m.media_type != "image" or m.decode_code != 0:
                continue
            th = thumbnail_2x(m.payload)
            rows.append(
                (int(d), th.shape[1], th.shape[0], int(th.sum(dtype="int64")))
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "thumb_w", "thumb_h", "thumb_sum"]
        )


@register(
    "image_thumbnail_stats",
    oracle="""
    WITH imgs AS (
      SELECT doc_id, doc_id % 997 AS s,
             16 + doc_id % 48 AS w, 16 + (doc_id // 7) % 32 AS h
      FROM documents WHERE doc_id % 3 = 0
    ), px AS (
      SELECT doc_id, w // 2 AS thumb_w, h // 2 AS thumb_h,
             unnest(range((w // 2) * (h // 2))) AS i, s, w
      FROM imgs
    ), blocks AS (
      SELECT doc_id, thumb_w, thumb_h,
             ((s*31 + (2*(i // thumb_w))*w   + 2*(i % thumb_w))     % 256
            + (s*31 + (2*(i // thumb_w))*w   + 2*(i % thumb_w) + 1) % 256
            + (s*31 + (2*(i // thumb_w)+1)*w + 2*(i % thumb_w))     % 256
            + (s*31 + (2*(i // thumb_w)+1)*w + 2*(i % thumb_w) + 1) % 256
             ) // 4 AS v
      FROM px
    )
    SELECT doc_id, thumb_w, thumb_h, sum(v)::BIGINT AS thumb_sum
    FROM blocks GROUP BY doc_id, thumb_w, thumb_h
    """,
)
def image_thumbnail_stats(spark, sf_dir):
    """2x block-mean 'resize' feature kernel over images decoded from
    the scanned binary column; integer pixel sum makes the oracle
    comparison exact (no float rounding hazard)."""
    d = media_table(spark, sf_dir).select("doc_id", "media")
    out = d.mapInPandas(
        _thumb_stats,
        schema="doc_id bigint, thumb_w int, thumb_h int, thumb_sum bigint",
    )
    return out


def _frame_checksums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ragflow_spark.kernels.media import decode_media, sample_frames

    for pdf in batches:
        rows = []
        for d, payload in zip(pdf["doc_id"].astype("int64"), pdf["media"]):
            m = decode_media(payload)
            if m.media_type != "video" or m.decode_code != 0:
                continue
            sampled = sample_frames(m.payload, every=FRAME_EVERY)
            first_px_sum = int(sampled[:, 0, 0].astype("int64").sum())
            rows.append((int(d), int(sampled.shape[0]), first_px_sum))
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_sampled", "first_px_sum"]
        )


@register(
    "frame_sample_checksum",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id, doc_id % 997 AS s, 4 + doc_id % 12 AS nf
      FROM documents WHERE doc_id % 3 = 1
    ), frames AS (
      SELECT doc_id, unnest(range(nf)) AS f, s FROM vids
    )
    SELECT doc_id,
           count(*) AS n_sampled,
           sum((s*31 + f*7) % 256)::BIGINT AS first_px_sum
    FROM frames WHERE f % {FRAME_EVERY} = 0
    GROUP BY doc_id
    """,
)
def frame_sample_checksum(spark, sf_dir):
    """Frame-sample kernel (every {FRAME_EVERY}rd frame) over videos
    decoded from the scanned binary column; checksum = sum of each
    sampled frame's first pixel, integer-exact against the oracle."""
    d = media_table(spark, sf_dir).select("doc_id", "media")
    return d.mapInPandas(
        _frame_checksums,
        schema="doc_id bigint, n_sampled bigint, first_px_sum bigint",
    )
