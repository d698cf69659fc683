"""Bloom-prefiltered incremental dedup: filter-level guarantees (no
false negatives, bounded FP rate), pruning effectiveness, and
differential equality with the exact operator."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ragflow_spark.operators.bloomfilter import (
    build_bloom,
    might_contain_filter,
    with_bloom_hashes,
)


@pytest.fixture(scope="module")
def ops():
    import ragflow_spark.operators as ops

    return ops


def _digests(spark, n, prefix):
    return with_bloom_hashes(
        spark.range(n).select(
            F.md5(F.concat(F.lit(prefix), F.col("id").cast("string"))).alias("h")
        ),
        "h",
    )


def test_bloom_has_no_false_negatives(spark):
    keys = _digests(spark, 500, "in:")
    bitmap, m_bits = build_bloom(keys, 500)
    assert might_contain_filter(keys, bitmap, m_bits).count() == 500


def test_bloom_fp_rate_within_sizing_bound(spark):
    """10 bits/key + k=7 sizes for ~1% FP; assert < 5% on fresh keys
    (deterministic: xxhash64 makes the FP set reproducible)."""
    bitmap, m_bits = build_bloom(_digests(spark, 500, "in:"), 500)
    fresh = _digests(spark, 2000, "out:")
    fp = might_contain_filter(fresh, bitmap, m_bits).count()
    assert fp / 2000 < 0.05, f"FP rate {fp/2000:.3f}"


def test_bloom_empty_committed_rejects_everything(spark):
    empty = _digests(spark, 0, "in:")
    bitmap, m_bits = build_bloom(empty, 0)
    probe = _digests(spark, 100, "out:")
    assert might_contain_filter(probe, bitmap, m_bits).count() == 0
    assert might_contain_filter(probe, bitmap, m_bits, negate=True).count() == 100


def test_bloom_twin_matches_exact_and_prunes(spark, sf_dir, ops):
    """The bloom twin returns exactly dedup_incremental's rows, and
    the pre-filter genuinely shrinks the join input: candidates =
    true dups + FPs, a strict minority of the arriving batch on a
    mostly-unique corpus."""
    from ragflow_spark.operators.corpus import _COMMITTED_MOD
    from ragflow_spark.operators.registry import table

    exact = sorted(
        map(tuple, ops.QUERIES["dedup_incremental"](spark, sf_dir).collect())
    )
    bloom = sorted(
        map(tuple, ops.QUERIES["dedup_incremental_bloom"](spark, sf_dir).collect())
    )
    assert exact == bloom

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    committed = d.filter(F.col("doc_id") % 10 < _COMMITTED_MOD).select("h").distinct()
    bitmap, m_bits = build_bloom(
        with_bloom_hashes(committed, "h"), committed.count()
    )
    new_docs = with_bloom_hashes(
        d.filter(F.col("doc_id") % 10 >= _COMMITTED_MOD), "h"
    )
    n_new = new_docs.count()
    n_candidates = might_contain_filter(new_docs, bitmap, m_bits).count()
    assert n_candidates < n_new, "bloom pruned nothing"
    # true dups lower-bound the candidate set (no false negatives)
    true_dups = new_docs.join(committed, "h", "left_semi").count()
    assert n_candidates >= true_dups


def test_staged_or_fold_matches_direct_collect(spark, sf_dir, monkeypatch):
    """Forcing the executor-side OR stage (driver budget of 1 byte)
    must produce the byte-identical bitmap the direct collect builds,
    and an over-cap bitmap must fail loudly instead of OOMing."""
    import pytest

    import ragflow_spark.operators.bloomfilter as bf
    from pyspark.sql import functions as F

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.md5("text").alias("h"))
        .repartition(8)
    )
    hashed = bf.with_bloom_hashes(d, "h")
    n = d.count()
    direct, m_direct = bf.build_bloom(hashed, n)
    monkeypatch.setattr(bf, "BLOOM_DRIVER_COLLECT_BUDGET", 1)
    staged, m_staged = bf.build_bloom(hashed, n)
    assert m_direct == m_staged
    assert direct == staged

    monkeypatch.setattr(bf, "BLOOM_MAX_BITMAP_BYTES", 16)
    with pytest.raises(ValueError, match="shard the filter"):
        bf.build_bloom(hashed, n)
