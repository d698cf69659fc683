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
3. OR the partition bitmaps on the driver (bounded: partitions x
   m/8 bytes; a 10^9-key 1%-FP filter is ~1.2 GB, built with a
   tree-reduce in production — here partition counts are small) and
   broadcast the result.
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


def build_bloom(hashed: DataFrame, n_keys: int) -> tuple[bytes, int]:
    """Bitmap bytes + m_bits for a Bloom over the (bh1, bh2) columns
    of ``hashed``. One mapInPandas pass emits a bitmap per partition;
    the driver ORs them (partition count x m/8 bytes, bounded)."""
    m_bits = max(64, BLOOM_BITS_PER_KEY * n_keys)
    m_bytes = (m_bits + 7) // 8

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

    parts = hashed.select("bh1", "bh2").mapInPandas(
        part, "bitmap binary"
    ).collect()
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
