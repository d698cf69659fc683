"""Concurrency-safe write-once directory caches (r4 ADVICE).

The materialized-input caches (sources/media_store.py parquet,
sources/cdx.py CDXJ text) were check-then-write: a `_SUCCESS` probe
followed by `.write.mode("overwrite")` straight into the published
path. Two concurrent sessions (bench + pytest is the realistic pair)
could race the probe, and a third reader could observe a partially
overwritten directory. The fix is the standard publish-by-rename
protocol: render into a unique sibling temp directory, then
``os.rename`` it into place — atomic on a POSIX filesystem, so readers
only ever see nothing or the complete cache. A loser in the race keeps
the winner's copy and discards its own.
"""

from __future__ import annotations

import os
import shutil
import uuid


def is_materialized(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def atomic_materialize(path: str, write_fn) -> str:
    """Ensure the cache dir ``path`` exists and is complete.

    ``write_fn(tmp_path)`` must render the full directory (including
    Spark's `_SUCCESS` marker) at ``tmp_path``; it is then published
    with one atomic rename. If a concurrent session published first,
    the temp copy is discarded — byte-identical by determinism of the
    generators, so whose copy survives is immaterial.
    """
    if is_materialized(path):
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        write_fn(tmp)
        os.rename(tmp, path)
    except OSError:
        if not is_materialized(path):
            raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def stamped_cache_path(
    env_var: str,
    default_subdir: str,
    prefix: str,
    sf_dir: str,
    extra_key: str = "",
    suffix: str = "",
) -> str:
    """Shared cache-key derivation for the write-once corpus caches
    (media_store / cdx / snapstore): <root>/<prefix>_<basename>_<md5
    of (absolute sf_dir, documents.parquet mtime/size, extra_key)>.

    The stamp means a regenerated or same-basename corpus never serves
    another corpus's artifact; ``extra_key`` must carry every GENERATOR
    parameter the artifact's shape depends on (e.g. snapstore's
    n_splits/wave_size), so changing a constant invalidates the cache
    instead of serving a stale artifact against a recomputed oracle.
    """
    import hashlib

    _repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    root = os.environ.get(env_var) or os.path.join(_repo, ".bench", default_subdir)
    ap = os.path.abspath(os.path.normpath(sf_dir))
    try:
        st = os.stat(os.path.join(ap, "documents.parquet"))
        stamp = f"{st.st_mtime_ns}-{st.st_size}"
    except OSError:
        stamp = "na"
    digest = hashlib.md5(f"{ap}|{stamp}|{extra_key}".encode()).hexdigest()[:10]
    return os.path.join(
        root, f"{prefix}_{os.path.basename(ap)}_{digest}{suffix}"
    )
