"""Distributed Bloom filter over a digest column — the committed-side
pre-filter for incremental dedup at 10^12-document scale.

Why: ``dedup_incremental`` joins every arriving document's digest
against the committed digest table. Bucketing already makes that join
shuffle-free on the committed side, but the ARRIVING side still
shuffles in full. In production (CCNet, Dolma's deduper) a Bloom
filter over the committed digests prunes the arriving batch first:
bloom-NEGATIVE docs are *provably* absent from the committed corpus
and skip the join entirely; only bloom-positives (true dups + the FP
rate) shuffle. The final answer stays EXACT — false positives are
resolved by the exact join that follows — so the operator keeps its
value oracle.

Spark 4 does not expose ``bloom_filter_agg``/``might_contain`` as
public SQL functions (they are internal to runtime join filtering), so
this builds the same thing from public primitives, Arrow-vectorized
end to end (no row-wise Python):

1. hash JVM-side: two independent 64-bit hashes per digest via
   ``xxhash64(h)`` and ``xxhash64(h, lit(1))`` — Kirsch-Mitzenmacher
   double hashing derives all k probe positions as ``h1 + i*h2``.
2. build per-partition bitmaps in ``mapInPandas`` with numpy scatter
   (``bitwise_or.at``) — one bitmap row per partition, never a row
   per key.
3. OR the partition bitmaps — directly on the driver while
   partitions x m/8 bytes fits BLOOM_DRIVER_COLLECT_BUDGET, else via
   an executor-side OR stage first (tree-reduce), so a 10^9-key
   ~1.2 GB filter over thousands of partitions never cliffs the
   driver — and broadcast the result.
4. probe with a vectorized ``pandas_udf`` over the same two hash
   columns.

Determinism: xxhash64 is deterministic across executors/runs, so the
bloom-positive set — and therefore every downstream plan — is
reproducible bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

BLOOM_BITS_PER_KEY = 10  # ~1% FP at k=7 (standard Bloom sizing)
BLOOM_NUM_HASHES = 7


def with_bloom_hashes(df: DataFrame, col: str) -> DataFrame:
    """Append the (bh1, bh2) 64-bit hash pair for ``col``, computed
    JVM-side so the Python stages only ever see int64 columns."""
    return df.withColumn("bh1", F.xxhash64(F.col(col))).withColumn(
        "bh2", F.xxhash64(F.col(col), F.lit(1))
    )


def _probe_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, k) probe bit positions via Kirsch-Mitzenmacher double
    hashing, uint64 wraparound arithmetic (deterministic, no Python
    loop over rows)."""
    i = np.arange(BLOOM_NUM_HASHES, dtype=np.uint64)
    return (
        h1.astype(np.uint64)[:, None] + i[None, :] * h2.astype(np.uint64)[:, None]
    ) % np.uint64(m_bits)


# The driver never collects more than this many bitmap bytes in one
# pass: above it, an executor-side OR stage folds the per-partition
# bitmaps first (the tree-reduce the module docstring promises —
# r4 ADVICE: the collect-all-partitions form was a silent
# driver-memory cliff at large n_keys x partitions).
BLOOM_DRIVER_COLLECT_BUDGET = 64 << 20
# hard ceiling on a single bitmap: the final filter must itself fit
# the driver + a task closure. Fails loudly instead of OOMing.
BLOOM_MAX_BITMAP_BYTES = 1 << 30


def _or_fold(batches):
    """mapInPandas stage that ORs every incoming bitmap row into one."""
    acc = None
    for pdf in batches:
        for b in pdf["bitmap"]:
            arr = np.frombuffer(b, dtype=np.uint8)
            acc = arr.copy() if acc is None else acc | arr
    if acc is not None:
        yield pd.DataFrame({"bitmap": [acc.tobytes()]})


def build_bloom(hashed: DataFrame, n_keys: int) -> tuple[bytes, int]:
    """Bitmap bytes + m_bits for a Bloom over the (bh1, bh2) columns
    of ``hashed``. One mapInPandas pass emits a bitmap per partition;
    when partitions x m/8 bytes exceeds the driver budget, an
    executor-side OR stage folds them to at most
    ``budget // m_bytes`` rows first, so the driver transfer is
    bounded regardless of input partitioning."""
    m_bits = max(64, BLOOM_BITS_PER_KEY * n_keys)
    m_bytes = (m_bits + 7) // 8
    if m_bytes > BLOOM_MAX_BITMAP_BYTES:
        raise ValueError(
            f"bloom bitmap would be {m_bytes} bytes for n_keys={n_keys}; "
            f"cap is {BLOOM_MAX_BITMAP_BYTES} — shard the filter "
            "(one bloom per digest prefix) above this"
        )

    def part(batches):
        bitmap = np.zeros(m_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            pos = _probe_positions(
                pdf["bh1"].to_numpy(), pdf["bh2"].to_numpy(), m_bits
            ).ravel()
            np.bitwise_or.at(
                bitmap, (pos >> 3).astype(np.int64), (1 << (pos & 7)).astype(np.uint8)
            )
        if seen:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    parts_df = hashed.select("bh1", "bh2").mapInPandas(part, "bitmap binary")
    n_parts = hashed.rdd.getNumPartitions()
    if n_parts * m_bytes > BLOOM_DRIVER_COLLECT_BUDGET:
        fanin = max(1, int(BLOOM_DRIVER_COLLECT_BUDGET // m_bytes))
        parts_df = parts_df.repartition(fanin).mapInPandas(
            _or_fold, "bitmap binary"
        )
    parts = parts_df.collect()
    acc = np.zeros(m_bytes, dtype=np.uint8)
    for r in parts:
        acc |= np.frombuffer(r["bitmap"], dtype=np.uint8)
    return acc.tobytes(), m_bits


def might_contain_filter(
    df: DataFrame, bitmap: bytes, m_bits: int, negate: bool = False
) -> DataFrame:
    """Keep only rows whose (bh1, bh2) pair is bloom-POSITIVE (or
    bloom-negative with ``negate=True``). The bitmap ships to
    executors via the task closure (broadcast-sized by construction; a
    multi-GB production filter would go through an explicit
    SparkContext.broadcast with identical dataflow)."""
    bm = np.frombuffer(bitmap, dtype=np.uint8)

    @F.pandas_udf("boolean")
    def probe(bh1: pd.Series, bh2: pd.Series) -> pd.Series:
        if not len(bh1):
            return pd.Series([], dtype=bool)
        pos = _probe_positions(bh1.to_numpy(), bh2.to_numpy(), m_bits)
        bits = (bm[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    pred = probe(F.col("bh1"), F.col("bh2"))
    return df.filter(~pred if negate else pred)
