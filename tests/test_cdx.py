"""CDXJ capture-index source (sources/cdx.py): parse round trip,
map-only read plan, and record-layout invariants. Cross-engine value
equality of the fetch-plan rollup is covered by test_oracle_parity.py
(cdx_fetch_plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ragflow_spark.sources.cdx import cdx_dir, read_cdx_index


def test_cdx_read_is_map_only(spark, sf_dir):
    from tests.test_plan_shape import plan_of

    idx = read_cdx_index(spark, cdx_dir(spark, sf_dir))
    assert "Exchange" not in plan_of(idx)


def test_cdx_round_trip_and_layout(spark, sf_dir):
    """Every documents row appears exactly once; urlkey is the SURT of
    its url; records are CONTIGUOUS within each warc file
    (max(offset + length) == sum(length), min(offset) == 0) — the
    invariant a range-fetch planner relies on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = read_cdx_index(spark, cdx_dir(spark, sf_dir))
    assert idx.count() == docs.count()
    assert idx.filter(F.col("length").isNull() | F.col("offset").isNull()).count() == 0

    # urlkey <-> url consistency on a sample row
    r = idx.filter(F.col("url").endswith("/doc-0")).collect()[0]
    host = r.url.split("/")[2]
    assert r.urlkey == ",".join(reversed(host.split("."))) + ")/doc-0"
    assert len(r.ts14) == 14 and r.ts14.isdigit()

    per_file = idx.groupBy("filename").agg(
        F.min("offset").alias("first_off"),
        F.max(F.col("offset") + F.col("length")).alias("end_off"),
        F.sum("length").alias("bytes"),
    )
    bad = per_file.filter(
        (F.col("first_off") != 0) | (F.col("end_off") != F.col("bytes"))
    )
    assert bad.count() == 0, bad.collect()


def test_cdx_cache_key_rotates_with_corpus(tmp_path, sf_dir):
    """Same basename, different corpus file -> different cache dir
    (the media_store regression class)."""
    import shutil
    from pathlib import Path

    from ragflow_spark.sources.cdx import cache_path

    p1 = cache_path(sf_dir)
    clone = tmp_path / Path(sf_dir).name
    clone.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", clone / "documents.parquet")
    p2 = cache_path(str(clone))
    assert p1 != p2
