"""Streaming count-min maintenance: keep a corpus-wide heavy-hitter
sketch current as crawl batches arrive — the streaming companion to
``ngram_heavy_hitters``'s bounded-state twin (operators/countmin.py),
the way decontam_gate.py companions ``decontaminate_stats``.

The CMS is a LINEAR sketch: sketch(A ∪ B) == sketch(A) + sketch(B)
elementwise, so maintaining it over a stream is exactly "build a grid
per micro-batch, add it into the running grid" — no per-key state
store, no watermark, no shuffle inside a batch beyond the builder's
own map-side pass. That is the whole point of sketch-based streaming
analytics (Cormode & Muthukrishnan 2005 §4: turnstile-model updates):
the state is a FIXED d x w integer grid no matter how many distinct
grams the stream has carried.

Implementation: ``foreachBatch`` builds the batch grid with the SAME
``build_cms`` the batch twin uses and sums it into the driver-held
accumulator (on a cluster: the grid is small enough that the driver
IS the right owner — d*w*8 = 16 KB here, and a production 4 x 2^20
grid is 32 MB; publish it wherever the query's consumers read it).
Equality with the one-shot batch sketch over the same input is the
linearity property, pinned by tests/test_streaming.py regardless of
how the source chops the stream into micro-batches.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ragflow_spark.operators.corpus import bigram_stream
from ragflow_spark.operators.countmin import CMS_D, CMS_W, build_cms


def run_cms_stream(
    docs: DataFrame,
    checkpoint_dir: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> np.ndarray:
    """Drain a documents stream (Trigger.AvailableNow) while folding
    each micro-batch's bigram CMS grid into the running sketch;
    returns the final d x w grid."""
    acc = np.zeros((d, w), dtype=np.int64)

    def fold(batch_df, _batch_id):
        nonlocal acc
        if batch_df.isEmpty():
            return
        acc = acc + build_cms(bigram_stream(batch_df), "gram", w=w, d=d)

    q = (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return acc
