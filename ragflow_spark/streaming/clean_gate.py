"""Streaming corpus-quality gate: the training-data cleanup chain as a
continuous pipeline over a documents stream — the streaming companion
to `corpus_clean_stats` (operators/textops.py).

Per micro-batch: the SAME map-side feature projection as the batch
rollup (clean_features: content fingerprint, quality score, token
count — shared Column expressions, not a reimplementation), then
exact-dup suppression via watermark-bounded streaming dedup state
(`dropDuplicatesWithinWatermark` on the 16-byte fingerprint — state
for a fingerprint is evicted once the watermark passes it, so state
stays bounded on an unbounded crawl; plain dropDuplicates would grow
state forever), then the quality/length gate filter.

Scale: features are stateless map work; the only state is the dedup
fingerprint set inside the watermark horizon; the gate is a filter.
Each micro-batch behaves like the batch job."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ragflow_spark.operators.textops import clean_features

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
# deterministic synthetic ingest time (documents carry no timestamp):
# EPOCH + doc_id seconds, mirroring the events table convention
_EPOCH = "2026-01-01 00:00:00"

DEFAULT_MIN_SCORE = 0.25  # drop the 'poor' bucket
DEFAULT_MIN_TOKS = 8


def documents_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(src_dir)


def clean_gate_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    min_score: float = DEFAULT_MIN_SCORE,
    min_toks: int = DEFAULT_MIN_TOKS,
) -> DataFrame:
    """documents stream -> gated (doc_id, fp, score, toks, ingest_ts)
    stream: one surviving row per fingerprint within the watermark
    horizon, quality and length gates applied after dedup (identical
    text has identical score/toks, so gating before or after dedup is
    equivalent — after keeps the dedup state ahead of the filter,
    which is the cheaper order when most dupes fail the gate too)."""
    feats = clean_features(docs).withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit(_EPOCH))
        + F.make_interval(secs=F.col("doc_id").cast("double")),
    )
    deduped = feats.withWatermark(
        "ingest_ts", watermark
    ).dropDuplicatesWithinWatermark(["fp"])
    return deduped.filter(
        (F.col("score") >= min_score) & (F.col("toks") >= min_toks)
    )
