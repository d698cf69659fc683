"""Streaming quality-classifier gate: drop crawl documents the
hashed-linear classifier scores negative, continuously — the
streaming companion to ``classifier_filter_stats``
(operators/trainprep.py), the way decontam_gate.py companions
``decontaminate_stats``.

The weight table is a run constant (classifiers retrain between
runs, not between micro-batches), so the gate is a STATELESS
map-side filter: the shared ``with_cls_score`` helper appends the
integer milli-score and the gate keeps score >= 0 — bit-identical
keep semantics to the batch operator by construction (one scoring
definition, two callers).

Scale: zero state, zero shuffle — each micro-batch is a filter. A
real 2M-bucket fastText table outgrows a plan literal; the
documented swap is a broadcast variable read inside a pandas UDF
doing the same hash->gather->sum (identical dataflow, still
stateless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ragflow_spark.operators.trainprep import with_cls_score


def classifier_gate_stream(docs: DataFrame) -> DataFrame:
    """documents stream -> the subset the classifier keeps
    (milli-score >= 0). Stateless; composes freely with the clean and
    decontamination gates (all three are filters, order-insensitive
    for the kept set)."""
    return (
        with_cls_score(docs)
        .filter(F.col("cls_milli") >= 0)
        .drop("cls_milli")
    )
