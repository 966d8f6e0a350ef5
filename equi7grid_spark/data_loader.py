"""Data-artifact resolution that also works from a --py-files zip.

`spark-submit --py-files equi7grid_spark.zip` imports the package from
a zip archive, where `Path(__file__).parent / "data"` is not a real
filesystem path. This helper resolves artifact names to on-disk paths,
extracting from the package resources into a per-user cache dir when
needed — so executors can np.load / pq.read_table normally.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from functools import lru_cache
from pathlib import Path

_PKG_DATA = Path(__file__).parent / "data"


@lru_cache(maxsize=1)
def _archive_tag() -> str:
    """Content hash of the zip archive the package is imported from,
    or '' when imported from a directory. Keying the cache dir on this
    makes staleness exact per shipped archive — a rebuilt zip (even
    with byte-identical-length artifacts, the round-3 size check's
    blind spot) lands in a fresh cache dir, while re-submitting the
    SAME zip (spark-submit copies it to a fresh per-app dir, so
    path/mtime are useless identity) keeps reusing one cache dir
    instead of leaking a new extraction per application. One archive
    read per process; per-resource cache hits need no payload read."""
    for anc in Path(__file__).parents:
        try:
            if anc.is_file():
                h = hashlib.sha256()
                with open(anc, "rb") as fh:
                    for block in iter(lambda: fh.read(1 << 20), b""):
                        h.update(block)
                return h.hexdigest()[:16]
        except OSError:
            pass
    return ""


@lru_cache(maxsize=None)
def resource_path(relpath: str) -> str:
    """Resolve any package-relative resource (e.g. 'jvm/equi7-kernel.jar')
    to an on-disk path, extracting from a zip import when needed.

    Concurrency: many python workers on one host race to extract the
    same resource, so the write goes to a PID-unique temp name
    published with an atomic os.replace (last writer wins with a
    complete file — never a partially-written one). Staleness: the
    cache dir is keyed by the archive's identity (_archive_tag), so an
    existing entry is always from THIS archive and is reused without
    re-reading the packaged bytes."""
    direct = Path(__file__).parent / relpath
    try:
        if direct.exists():
            return str(direct)
    except OSError:
        pass

    tag = _archive_tag()
    cache = Path(tempfile.gettempdir()) / f"equi7grid_spark_res_{os.getuid()}_{tag}"
    out = cache / relpath
    if out.exists():
        return str(out)

    import importlib.resources as res

    source = res.files("equi7grid_spark")
    for part in relpath.split("/"):
        source = source.joinpath(part)
    with source.open("rb") as fh:
        payload = fh.read()
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(out.suffix + f".tmp{os.getpid()}")
    tmp.write_bytes(payload)
    os.replace(tmp, out)
    _prune_stale_caches(cache)
    return str(out)


# A stale cache dir must be OLDER than this before pruning touches it:
# a CONCURRENT session built from a different archive tag (or its
# executors mid-scan) may still be reading its extraction — deleting a
# same-uid dir the moment a new tag appears would yank zone parquets
# out from under a running job (ADVICE r5). Several hours comfortably
# exceeds any single job on this engine while still bounding /tmp.
_PRUNE_MIN_AGE_S = 6 * 3600


def _prune_stale_caches(current: Path) -> None:
    """Best-effort removal of THIS user's extraction dirs for OTHER
    archive tags after a successful extraction — a long-lived host that
    rebuilds the zip repeatedly would otherwise accumulate unbounded
    /tmp dirs (ADVICE r4). Age-gated (ADVICE r5): only dirs whose
    mtime is > _PRUNE_MIN_AGE_S old are removed, so a concurrently
    RUNNING session on an older archive keeps its files; younger
    stale dirs are picked up by a later extraction. Other users' dirs
    (different uid suffix) are untouched; failures are ignored — the
    next successful extraction retries."""
    import shutil
    import time

    prefix = f"equi7grid_spark_res_{os.getuid()}_"
    cutoff = time.time() - _PRUNE_MIN_AGE_S
    try:
        for d in current.parent.iterdir():
            if (
                d.name.startswith(prefix)
                and d != current
                and d.is_dir()
                and d.stat().st_mtime < cutoff
            ):
                shutil.rmtree(d, ignore_errors=True)
    except OSError:
        pass


@lru_cache(maxsize=None)
def data_path(name: str) -> str:
    return resource_path(f"data/{name}")
