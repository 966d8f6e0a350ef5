"""Data-artifact resolution that also works from a --py-files zip.

`spark-submit --py-files equi7grid_spark.zip` imports the package from
a zip archive, where `Path(__file__).parent / "data"` is not a real
filesystem path. This helper resolves artifact names to on-disk paths,
extracting from the package resources into a per-user cache dir when
needed — so executors can np.load / pq.read_table normally.
"""

from __future__ import annotations

import os
import tempfile
from functools import lru_cache
from pathlib import Path

_PKG_DATA = Path(__file__).parent / "data"


@lru_cache(maxsize=None)
def resource_path(relpath: str) -> str:
    """Resolve any package-relative resource (e.g. 'jvm/equi7-kernel.jar')
    to an on-disk path, extracting from a zip import when needed.

    Concurrency + staleness: many python workers on one host race to
    extract the same resource, so the write goes to a PID-unique temp
    name published with an atomic os.replace (last writer wins with a
    complete file — never a partially-written one), and an existing
    cached copy is reused only when its size matches the packaged
    bytes, so shipping a rebuilt artifact in a new zip invalidates the
    old cache entry."""
    direct = Path(__file__).parent / relpath
    try:
        if direct.exists():
            return str(direct)
    except OSError:
        pass
    import importlib.resources as res

    source = res.files("equi7grid_spark")
    for part in relpath.split("/"):
        source = source.joinpath(part)
    with source.open("rb") as fh:
        payload = fh.read()

    cache = Path(tempfile.gettempdir()) / f"equi7grid_spark_res_{os.getuid()}"
    out = cache / relpath
    out.parent.mkdir(parents=True, exist_ok=True)
    try:
        if out.stat().st_size == len(payload):
            return str(out)
    except OSError:
        pass
    tmp = out.with_suffix(out.suffix + f".tmp{os.getpid()}")
    tmp.write_bytes(payload)
    os.replace(tmp, out)
    return str(out)


@lru_cache(maxsize=None)
def data_path(name: str) -> str:
    return resource_path(f"data/{name}")
