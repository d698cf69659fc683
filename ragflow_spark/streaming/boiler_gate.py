"""Streaming host-boilerplate scrub: remove each incoming page's
site-chrome spans under a FROZEN per-host boilerplate table — the
streaming companion to ``host_boilerplate_stats``
(operators/corpus.py), the way dsir_gate companions the DSIR scorer.

The table is detected ONCE over the committed corpus
(``host_boilerplate_table`` — "what repeats across a site" is a
corpus property, not a micro-batch one) and frozen for the run, so
the gate is a STATELESS map-side rewrite: one vectorized pandas UDF
re-derives each page's spans (the shared SEG_WORDS segmentation) and
drops the flagged ones. Batch and stream share ONE scrub definition
(``scrub_boilerplate`` below), so keep semantics are bit-identical by
construction.

Scale: zero state, zero shuffle — each micro-batch is a projection.
The frozen table is a closure constant here (site chrome is small by
definition — host_boilerplate_table enforces the bound loudly); a
table beyond closure size ships as a broadcast variable read inside
the same UDF (identical dataflow, still stateless). Re-detection
belongs between runs, on a new committed-corpus snapshot.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ragflow_spark.operators.corpus import SEG_WORDS


def scrub_boilerplate(text: str, flagged: frozenset) -> tuple[str, int]:
    """Drop this page's flagged SEG_WORDS-word spans; returns
    (cleaned text, n spans removed). The ONE scrub definition both
    the batch parity test and the streaming gate call. (Plain
    docstring on purpose: an f-string here is not a __doc__ and
    would re-format per call inside the per-row UDF loop.)"""
    ws = text.split(" ")
    kept, removed = [], 0
    for i in range(0, len(ws), SEG_WORDS):
        seg = " ".join(ws[i : i + SEG_WORDS])
        if hashlib.md5(seg.encode()).hexdigest() in flagged:
            removed += 1
        else:
            kept.append(seg)
    return " ".join(kept), removed


def boilerplate_scrub_stream(
    docs: DataFrame, table: dict[str, frozenset]
) -> DataFrame:
    """documents stream -> (doc_id, source, text scrubbed of frozen
    host boilerplate, boiler_removed). Stateless; composes with the
    clean / classifier / decontamination / DSIR gates."""
    empty = frozenset()

    @F.pandas_udf("struct<text: string, boiler_removed: int>")
    def scrub(source: pd.Series, text: pd.Series) -> pd.DataFrame:
        out_t, out_n = [], []
        for s, t in zip(source, text):
            cleaned, n = scrub_boilerplate(t, table.get(s, empty))
            out_t.append(cleaned)
            out_n.append(n)
        return pd.DataFrame({"text": out_t, "boiler_removed": out_n})

    return docs.select(
        "doc_id",
        "source",
        scrub(F.col("source"), F.col("text")).alias("sc"),
    ).select(
        "doc_id",
        "source",
        F.col("sc.text").alias("text"),
        F.col("sc.boiler_removed").alias("boiler_removed"),
    )
