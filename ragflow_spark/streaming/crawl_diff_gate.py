"""Streaming re-crawl change gate: as current-crawl pages arrive,
emit only the ones worth re-extracting — pages whose content digest is
ABSENT from the committed previous snapshot (added) or DIFFERENT
(changed) — the streaming companion to ``crawl_snapshot_diff``
(operators/corpus.py), the way classifier_gate.py companions
``classifier_filter_stats``. Unchanged pages are served from the
committed store (plans/checkpoint.py snapshot chain) and never re-enter
the pipeline.

The gate is STATELESS: a stream-static left join of the arriving batch
against the committed digest table keyed by page id, then a row-local
digest compare. No watermark, no streaming state store — the committed
snapshot is a run constant (it advances between crawls, not between
micro-batches).

Scale: the committed side is ~10^9 (page_id, 16-byte digest) rows —
too big to broadcast, so in production it is written BUCKETED by page
id (Iceberg bucket transform, the dedup_incremental committed-side
story) and only the tiny arriving micro-batch repartitions to meet it;
page text never joins, only its digest column computed at the stream
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_digests(docs: DataFrame) -> DataFrame:
    """(doc_id, digest) projection of a committed snapshot — the
    static join side. Digest-only: text is dropped at the scan."""
    return docs.select("doc_id", F.md5("text").alias("prev_digest"))


def crawl_diff_gate_stream(
    curr_stream: DataFrame, prev_digests: DataFrame
) -> DataFrame:
    """current-crawl stream -> the added/changed subset, tagged with
    ``change_kind`` ('added' | 'changed'). Unchanged pages (digest
    match) are dropped."""
    cur = curr_stream.withColumn("cur_digest", F.md5("text"))
    j = cur.join(prev_digests, "doc_id", "left")
    return (
        j.filter(
            F.col("prev_digest").isNull()
            | (F.col("cur_digest") != F.col("prev_digest"))
        )
        .withColumn(
            "change_kind",
            F.when(F.col("prev_digest").isNull(), F.lit("added")).otherwise(
                F.lit("changed")
            ),
        )
        .drop("prev_digest", "cur_digest")
    )
