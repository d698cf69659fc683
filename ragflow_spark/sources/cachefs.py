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
