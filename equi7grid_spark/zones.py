"""Equi7 zone geometry: loading, prefiltered point-in-zone assignment.

The seven continental zone polygons (and their ~100 km land-buffered
variants) are vendored as NumPy ring arrays in
``equi7grid_spark/data/zones_geog.npz`` — converted once by
``scripts/prepare_data.py`` from the reference's published GeoParquet
zone files (/root/reference/src/equi7grid/data/zones/*.parquet,
MIT-licensed public data of the Equi7Grid specification). The engine
never reads the reference checkout at runtime.

Zone assignment (reference ``get_systems_from_lonlat``, core.py:436)
is served by a two-stage kernel designed for 10^12-row scale:

1. a 1-degree lon/lat prefilter grid (built at prepare time) classifies
   each point per zone as OUT / IN / BOUNDARY with one integer gather —
   >99% of points finish here;
2. only BOUNDARY-cell points run the exact even-odd PIP against the
   zone rings (vectorized NumPy).

Everything is loaded lazily and cached per process, so Spark python
workers pay the (~2 MB) load once per executor, not per batch.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

from equi7grid_spark.constants import DEFAULT_SYSTEM_ORDER
from equi7grid_spark.data_loader import data_path
from equi7grid_spark.geom import points_in_rings

DATA_DIR = Path(__file__).parent / "data"

# Prefilter grid constants (must match scripts/prepare_data.py).
PF_CELL_DEG = 1.0
PF_NX, PF_NY = 360, 180
PF_OUT, PF_IN, PF_BOUNDARY = 0, 1, 2


@lru_cache(maxsize=4)
def load_zone_polys(variant: str = "std") -> dict[str, list[list[np.ndarray]]]:
    """cc -> list of polygon pieces, each a list of (n,2) lon/lat rings."""
    npz = np.load(data_path("zones_geog.npz"))
    index = npz["index"]  # array of "CC_variant_p{i}_r{j}" key strings
    out: dict[str, list[list[np.ndarray]]] = {}
    for key in index:
        key = str(key)
        cc, var, p, r = key.split("_")
        if var != variant:
            continue
        pi, ri = int(p[1:]), int(r[1:])
        polys = out.setdefault(cc, [])
        while len(polys) <= pi:
            polys.append([])
        rings = polys[pi]
        while len(rings) <= ri:
            rings.append(None)  # type: ignore[arg-type]
        rings[ri] = npz[key]
    return out


@lru_cache(maxsize=4)
def load_prefilter(variant: str = "std") -> dict[str, np.ndarray]:
    """cc -> uint8 grid[PF_NX, PF_NY] of OUT/IN/BOUNDARY states."""
    npz = np.load(data_path("prefilter.npz"))
    return {cc: npz[f"{cc}_{variant}"] for cc in DEFAULT_SYSTEM_ORDER}


@lru_cache(maxsize=4)
def load_zone_polys_proj(variant: str = "std") -> dict[str, list[list[np.ndarray]]]:
    """cc -> projected (AEQD meters) zone polygon pieces, densified at
    0.1 degree before projection (reference core.py:406-410 semantics)."""
    npz = np.load(data_path("zones_proj.npz"))
    index = npz["index"]
    out: dict[str, list[list[np.ndarray]]] = {}
    for key in index:
        key = str(key)
        cc, var, p, r = key.split("_")
        if var != variant:
            continue
        pi, ri = int(p[1:]), int(r[1:])
        polys = out.setdefault(cc, [])
        while len(polys) <= pi:
            polys.append([])
        rings = polys[pi]
        while len(rings) <= ri:
            rings.append(None)  # type: ignore[arg-type]
        rings[ri] = npz[key]
    return out


def zone_membership(
    lon: np.ndarray,
    lat: np.ndarray,
    *,
    buffered: bool = False,
    system_order: tuple[str, ...] = DEFAULT_SYSTEM_ORDER,
) -> np.ndarray:
    """Boolean membership matrix [n_points, n_systems] in system_order.

    Non-buffered zones partition the globe (reference
    tests/test_equi7grid.py:405-409); buffered zones overlap so several
    columns can be True (:412-418).
    """
    variant = "bfrd" if buffered else "std"
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    # Normalize lon into [-180, 180) and clamp lat.
    lon = (lon + 180.0) % 360.0 - 180.0
    lat = np.clip(lat, -90.0, 90.0)

    ix = np.clip(np.floor(lon + 180.0).astype(np.int64), 0, PF_NX - 1)
    iy = np.clip(np.floor(lat + 90.0).astype(np.int64), 0, PF_NY - 1)

    pf = load_prefilter(variant)
    polys = load_zone_polys(variant)

    n = lon.size
    member = np.zeros((n, len(system_order)), dtype=bool)
    for j, cc in enumerate(system_order):
        state = pf[cc][ix, iy]
        col = state == PF_IN
        bmask = state == PF_BOUNDARY
        if bmask.any():
            bl = lon[bmask]
            bb = lat[bmask]
            exact = np.zeros(bl.shape, dtype=bool)
            for rings in polys[cc]:
                exact |= points_in_rings(bl, bb, rings)
            col[bmask] = exact
        member[:, j] = col
    return member


def assign_primary_zone_code(
    lon: np.ndarray,
    lat: np.ndarray,
    *,
    buffered: bool = False,
    system_order: tuple[str, ...] = DEFAULT_SYSTEM_ORDER,
) -> np.ndarray:
    """Index into system_order of the first matching zone (-1 if none).

    Integer codes keep the Arrow boundary and the per-batch grouping
    cheap; strings materialize JVM-side (see operators/assign.py).
    """
    member = zone_membership(lon, lat, buffered=buffered, system_order=system_order)
    first = np.argmax(member, axis=1).astype(np.int8)
    return np.where(member.any(axis=1), first, np.int8(-1))


def assign_primary_zone(
    lon: np.ndarray,
    lat: np.ndarray,
    *,
    buffered: bool = False,
    system_order: tuple[str, ...] = DEFAULT_SYSTEM_ORDER,
) -> np.ndarray:
    """First matching zone per point in system_order ('' if none).

    Matches reference lonlat_to_xy's dict ordering / GeomOutOfZoneError
    semantics (tests/test_equi7grid.py:405-439): caller decides how to
    treat '' (error or filter).
    """
    code = assign_primary_zone_code(
        lon, lat, buffered=buffered, system_order=system_order
    )
    codes = np.array(list(system_order) + [""], dtype=object)
    return codes[code]
