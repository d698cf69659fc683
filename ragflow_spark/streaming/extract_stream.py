"""Streaming skin over the extraction pipeline.

The same zero-shuffle kernel path as plans/pipeline.py, but fed by
``readStream`` over a pages directory: new page files landing from a
crawler are extracted incrementally, micro-batch by micro-batch —
the continuous-ingest companion to the batch/wave (checkpoint.py)
path. mapInPandas runs unchanged on a streaming DataFrame, so the
kernels, schema, and error-as-row semantics are literally the same
objects the batch path uses.

Scale: each micro-batch behaves like the batch job (map-only over the
batch's file splits, maxFilesPerTrigger bounds batch size); exactly
-once delivery to the sink comes from the streaming checkpoint +
idempotent file sink, replacing the wave manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ragflow_spark.plans.pipeline import assign_splits, extract_pages
from ragflow_spark.sources.pages import PAGES_SCHEMA


def pages_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(src_dir)


def extract_stream(
    pages: DataFrame,
    n_splits: int = 64,
    budget: int = 256,
) -> DataFrame:
    """Streaming pages -> streaming extracted rows (same schema as the
    batch `extract_pages`). Hot-host salting needs a corpus pre-pass,
    which a stream doesn't have; split_id degrades to plain host-hash
    (`hot_hosts=None`) — fine, because the streaming path never
    repartitions by split (zero-shuffle), so split_id is only output
    metadata here."""
    staged = assign_splits(pages, n_splits=n_splits, hot_hosts=None)
    return extract_pages(staged, budget=budget)


def run_extract_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_splits: int = 64,
    budget: int = 256,
    max_files_per_trigger: int | None = None,
):
    """Drain all currently-available page files into out_dir parquet
    (Trigger.AvailableNow); restartable via the streaming checkpoint.
    Returns the terminated StreamingQuery."""
    ex = extract_stream(
        pages_stream(spark, src_dir, max_files_per_trigger),
        n_splits=n_splits,
        budget=budget,
    )
    q = (
        ex.drop("chunks")  # flat sink schema; chunks explode downstream
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
