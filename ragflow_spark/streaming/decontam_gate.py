"""Streaming benchmark-decontamination gate: drop crawl documents that
share a word n-gram with a held-out eval set, continuously — the
streaming companion to ``decontaminate_stats``
(operators/trainprep.py), the way clean_gate.py companions
``corpus_clean_stats``.

The eval-gram set is a run constant (eval suites change between
training runs, not between micro-batches), so the gate is a STATELESS
map-side filter: per document, build the same 8-gram array as the
batch operator (shared ``word_ngrams`` helper) and test overlap
against the eval grams folded into a literal array.
``arrays_overlap(grams, lit_set)`` is deliberately a plain binary
expression, NOT a higher-order-function lambda — Catalyst
constant-folds the literal once, whereas any expression inside a
``exists()`` lambda re-evaluates per element (CLAUDE.md invariant).

Scale: zero state, zero shuffle — each micro-batch is a filter. A
10^6-gram eval suite outgrows a codegen literal; the documented swap
is a broadcast Bloom filter over gram hashes tested in the same
row-local position (identical dataflow, still stateless). The batch
operator's broadcast semi-join form is NOT available on a stream
(doc-level regrouping of exploded grams would need a watermarked
aggregation for no benefit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ragflow_spark.operators.trainprep import DECONTAM_NGRAM, word_ngrams


def decontam_gate_stream(
    docs: DataFrame, eval_grams: list[str], n: int = DECONTAM_NGRAM
) -> DataFrame:
    """documents stream -> the subset sharing no word n-gram with
    ``eval_grams``. Stateless; composes before/after clean_gate_stream
    (order does not change the kept set — both are filters)."""
    if not eval_grams:
        return docs
    grams = word_ngrams(F.split(F.col("text"), " "), n)
    lit_set = F.array(*[F.lit(g) for g in sorted(set(eval_grams))])
    return docs.filter(~F.arrays_overlap(grams, lit_set))
