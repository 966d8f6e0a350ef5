"""Data-artifact resolution that also works from a --py-files zip.

`spark-submit --py-files equi7grid_spark.zip` imports the package from
a zip archive, where `Path(__file__).parent / "data"` is not a real
filesystem path. This helper resolves artifact names to on-disk paths,
extracting from the package resources into a per-process cache dir
when needed — so executors can np.load / pq.read_table normally.
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
    to an on-disk path, extracting from a zip import when needed."""
    direct = Path(__file__).parent / relpath
    try:
        if direct.exists():
            return str(direct)
    except OSError:
        pass
    import importlib.resources as res

    cache = Path(tempfile.gettempdir()) / f"equi7grid_spark_res_{os.getuid()}"
    out = cache / relpath
    out.parent.mkdir(parents=True, exist_ok=True)
    if not out.exists():
        source = res.files("equi7grid_spark")
        for part in relpath.split("/"):
            source = source.joinpath(part)
        tmp = out.with_suffix(out.suffix + ".tmp")
        with source.open("rb") as fh:
            tmp.write_bytes(fh.read())
        tmp.replace(out)
    return str(out)


@lru_cache(maxsize=None)
def data_path(name: str) -> str:
    direct = _PKG_DATA / name
    try:
        if direct.exists():
            return str(direct)
    except OSError:
        pass
    # zip import: extract via importlib.resources into a cache dir
    import importlib.resources as res

    cache = Path(tempfile.gettempdir()) / f"equi7grid_spark_data_{os.getuid()}"
    cache.mkdir(parents=True, exist_ok=True)
    out = cache / name
    if not out.exists():
        source = res.files("equi7grid_spark").joinpath("data").joinpath(name)
        tmp = out.with_suffix(out.suffix + ".tmp")
        with source.open("rb") as fh:
            tmp.write_bytes(fh.read())
        tmp.replace(out)
    return str(out)
