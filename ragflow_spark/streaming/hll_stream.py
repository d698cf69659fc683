"""Streaming HyperLogLog maintenance: keep per-source unique-content
cardinalities current as crawl batches arrive — the streaming
companion to ``hll_cardinality`` (operators/hll.py), the way
sketch_stream.py companions the count-min twin.

Where the CMS folds by elementwise ADDITION (linear sketch), HLL folds
by elementwise MAX: max-merge is the HLL union operator (Flajolet et
al. 2007 §5 — registers of sketch(A ∪ B) are the pairwise maxima of
sketch(A) and sketch(B)), so maintaining the sketch over a stream is
exactly "build a register table per micro-batch with the SAME kernel
the batch query uses, max it into the running registers". No per-key
state store, no watermark, and the per-batch collect is bounded by
sources x m register rows no matter how many pages the batch carried
— the same fixed-state argument as the CMS grid, with the same
production note (a per-source 64-register sketch is sources x 64
bytes of driver state; publish wherever consumers read it).

Exactness: because merge is max and the kernel is shared, the folded
stream sketch is IDENTICAL to the one-shot batch sketch over the same
input regardless of how the source chops the stream into
micro-batches — pinned by tests/test_streaming.py against the batch
query's estimates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ragflow_spark.operators.hll import HLL_M, hll_register_table


def run_hll_stream(
    docs: DataFrame, checkpoint_dir: str
) -> dict[str, np.ndarray]:
    """Drain a documents stream (Trigger.AvailableNow) while
    max-folding each micro-batch's HLL register table into the
    running per-source sketches; returns {source: m-length int64
    register vector} (estimate with
    operators.hll.estimate_registers)."""
    acc: dict[str, np.ndarray] = {}

    def fold(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        for row in hll_register_table(batch_df).collect():
            regs = acc.setdefault(
                row["source"], np.zeros(HLL_M, dtype=np.int64)
            )
            if row["m"] > regs[row["idx"]]:
                regs[row["idx"]] = row["m"]

    q = (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return acc
