"""Packaging for spark-submit --py-files (north_rule deployment mode).

``package_zip()`` builds a wheel-less zip of the package; ``get_spark``
ships it to workers via ``sc.addPyFile`` so kernels imported inside
pandas UDFs resolve on every executor — the same artifact you would
pass as ``spark-submit --py-files ragflow_spark.zip job.py`` on a real
cluster. Idempotent and content-addressed (rebuilds only when sources
change), so repeated sessions in one sandbox stay cheap.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def _source_files() -> list[str]:
    out = []
    for root, _dirs, files in os.walk(_PKG_DIR):
        for f in sorted(files):
            if f.endswith(".py"):
                out.append(os.path.join(root, f))
    return sorted(out)


def package_zip() -> str:
    files = _source_files()
    h = hashlib.sha256()
    for f in files:
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    digest = h.hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), f"ragflow_spark-{digest}.zip")
    if os.path.exists(path):
        return path
    tmp = path + ".tmp"
    base = os.path.dirname(_PKG_DIR)
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            z.write(f, os.path.relpath(f, base))
    os.replace(tmp, path)
    return path
