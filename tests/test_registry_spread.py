"""spread() gating (round-2 advice): repartition only when the input
is BOTH few-files and few-bytes; large splittable files and already-
parallel non-file plans must pass through shuffle-free."""

from __future__ import annotations

import ragflow_spark.operators.registry as reg


def _has_exchange(df) -> bool:
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()


def test_spread_repartitions_tiny_single_file(spark, sf_dir):
    df = reg.spread(reg.table(spark, sf_dir, "documents"))
    assert _has_exchange(df), "tiny 1-file scan must spread"


def test_spread_passes_large_single_file(spark, sf_dir, monkeypatch):
    """A single SPLITTABLE multi-GB parquet yields many scan
    partitions via maxPartitionBytes — spread must NOT add a
    shuffle on top (file count alone is not underprovisioning)."""
    monkeypatch.setattr(reg, "_local_size", lambda uri: 64 << 30)
    df = reg.spread(reg.table(spark, sf_dir, "documents"))
    assert not _has_exchange(df)


def test_spread_unstatable_store_passes_through(spark, sf_dir, monkeypatch):
    def boom(uri):
        raise OSError("no local stat for object store")

    monkeypatch.setattr(reg, "_local_size", boom)
    df = reg.spread(reg.table(spark, sf_dir, "documents"))
    assert not _has_exchange(df)


def test_spread_nonfile_plan_uses_partition_count(spark):
    many = spark.range(0, 1000, 1, 16)  # already spans the cluster
    assert not _has_exchange(reg.spread(many))
    few = spark.range(0, 1000, 1, 1)
    assert _has_exchange(reg.spread(few))
