"""Streaming DSIR gate: keep only target-leaning crawl documents,
continuously — the streaming companion to ``dsir_importance_stats``
(operators/trainprep.py), the way classifier_gate.py companions
``classifier_filter_stats``.

The lambda table is estimated ONCE over the committed corpus
(``dsir_lambda_table`` — DSIR's importance distributions describe the
corpus vs the target domain, not a micro-batch) and then FROZEN for
the run, so the gate is a STATELESS map-side filter: the shared
``with_dsir_score`` helper appends the exact-integer milli-score and
the gate keeps mean-ratio > 1 docs (dsir_milli > 1000 * dsir_nf) —
bit-identical keep semantics to the batch operator by construction
(one scoring definition, two callers).

Scale: zero state, zero shuffle — each micro-batch is a filter. A
real 10k+-bucket table outgrows a plan literal; the documented swap is
a broadcast variable read inside a pandas UDF doing the same
hash->gather->sum (identical dataflow, still stateless). Re-estimating
lambda belongs between runs (a new committed-corpus snapshot), exactly
like classifier retraining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ragflow_spark.operators.trainprep import with_dsir_score


def dsir_gate_stream(docs: DataFrame, lam: list[int]) -> DataFrame:
    """documents stream -> the target-leaning subset under the frozen
    lambda table (mean milli-ratio > 1000). Stateless; composes freely
    with the clean / classifier / decontamination gates (all filters,
    order-insensitive for the kept set)."""
    return (
        with_dsir_score(docs, lam)
        .filter(F.col("dsir_milli") > 1000 * F.col("dsir_nf"))
        .drop("dsir_milli", "dsir_nf")
    )
