"""Write-once cache of a REAL multi-wave checkpoint run, so the
snapshot-maintenance queries read and parse an actual snapshot chain
(the media_store / cdx materialize-then-parse invariant: the query
must consume the materialized artifact, the oracle recomputes its
deterministic structure arithmetically).

The cached run uses a FIXED (n_splits, wave_size) so the chain shape —
ceil(n_splits / wave_size) snapshots, wave k covering the k-th chunk of
the sorted split ids — is corpus-independent: run_resumable processes
``sorted(set(range(n_splits)) - done)`` chunked by wave_size
(plans/checkpoint.py), which on a fresh run is exactly sequential
chunking.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

CACHE_ENV = "SPARK_GRAFT_SNAPSTORE_DIR"

SNAPSTORE_N_SPLITS = 16
SNAPSTORE_WAVE_SIZE = 3  # -> ceil(16/3) = 6 snapshots, ragged tail


def cache_path(sf_dir: str) -> str:
    """Keyed by corpus stamp AND the run-shape constants: the cached
    chain is a function of (corpus, n_splits, wave_size), so bumping a
    constant must invalidate the cache rather than serve a 6-snapshot
    chain against an oracle recomputed for a different shape."""
    from ragflow_spark.sources.cachefs import stamped_cache_path

    return stamped_cache_path(
        CACHE_ENV,
        "snapstore",
        "snap",
        sf_dir,
        extra_key=f"{SNAPSTORE_N_SPLITS}-{SNAPSTORE_WAVE_SIZE}",
    )


def snapshot_run_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) a real resumable extraction run for sf_dir
    and return its output dir — snapshots/ carries the committed
    snap-*.json chain the maintenance queries parse."""
    from ragflow_spark.plans.checkpoint import run_resumable
    from ragflow_spark.sources.cachefs import atomic_materialize
    from ragflow_spark.sources.pages import synthesize_pages

    def write(tmp: str) -> None:
        pages = synthesize_pages(spark, sf_dir)
        run_resumable(
            spark,
            pages,
            tmp,
            run_id="snapstore",
            n_splits=SNAPSTORE_N_SPLITS,
            wave_size=SNAPSTORE_WAVE_SIZE,
        )
        # run_resumable leaves _SUCCESS inside extracted/; the cache
        # probe wants one at the run root
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    return atomic_materialize(cache_path(sf_dir), write)
