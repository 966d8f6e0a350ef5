"""ROI tile search: which tiles intersect a region of interest.

Reference semantics (get_tiles_in_geog_bbox / get_tiles_in_geom,
reference core.py:230-290,454-518): geographic ROI → intersect with
each continental zone polygon in geographic space → densify at 0.1° →
AEQD-project → enumerate tiles intersecting the projected region,
continent by continent in system_order. Antimeridian-crossing bboxes
are given as lon_min > lon_max (reference docs/guides/grid.ipynb;
goldens tests/test_equi7grid.py:301-337).

Driver-side: ROIs are tiny; the result (a tile list) is what gets
broadcast into Spark joins. All geometry math is vectorized NumPy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from equi7grid_spark.catalog import catalog_cells
from equi7grid_spark.clip import clip_ring_convex, ensure_ccw
from equi7grid_spark.constants import (
    DEF_SEG_LEN_DEG,
    GridConfig,
    TILING_ID_TO_SIZE,
)
from equi7grid_spark.geodesy import aeqd_forward
from equi7grid_spark.geom import bbox_ring, cells_intersecting_polys, densify_ring
from equi7grid_spark.zones import load_zone_polys


@dataclass(frozen=True)
class TileRecord:
    subgrid: str
    tilename: str
    ll_x: float
    ll_y: float
    tile_size: float
    covers_land: bool

    @property
    def outer_boundary_extent(self) -> tuple[float, float, float, float]:
        return (self.ll_x, self.ll_y, self.ll_x + self.tile_size, self.ll_y + self.tile_size)


def split_bbox_antimeridian(
    bbox: tuple[float, float, float, float],
) -> list[tuple[float, float, float, float]]:
    """lon_min > lon_max means the bbox crosses the antimeridian and is
    split into two boxes (reference docs/guides/grid.ipynb note)."""
    lon_min, lat_min, lon_max, lat_max = bbox
    if lon_min > lon_max:
        return [
            (lon_min, lat_min, 180.0, lat_max),
            (-180.0, lat_min, lon_max, lat_max),
        ]
    return [bbox]


def _roi_rings_from_bbox(bbox: tuple[float, float, float, float]) -> list[np.ndarray]:
    return [
        bbox_ring(x0, y0, x1, y1)
        for (x0, y0, x1, y1) in split_bbox_antimeridian(bbox)
        if x1 > x0 and y1 > y0
    ]


def _roi_rings_from_lonlat_polygon(points: np.ndarray) -> list[np.ndarray]:
    """Normalize a lon/lat polygon ROI into non-antimeridian-crossing
    convex rings. Crossing is detected by a consecutive lon jump > 180°
    (the reference's test polygons use continuous >180 lons for this,
    tests/test_equi7grid.py:24-31)."""
    pts = np.asarray(points, dtype=np.float64)
    if (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    lon = pts[:, 0].copy()
    crossing = np.abs(np.diff(np.concatenate([lon, lon[:1]]))).max() > 180.0
    if not crossing:
        return [ensure_ccw(np.vstack([pts, pts[:1]]))]
    # Unwrap into [0, 360) so the ring is continuous, then split at 180.
    lon_u = np.where(lon < 0.0, lon + 360.0, lon)
    ring_u = np.column_stack([lon_u, pts[:, 1]])
    ring_u = ensure_ccw(np.vstack([ring_u, ring_u[:1]]))
    west = clip_ring_convex(ring_u, bbox_ring(0.0, -90.0, 180.0, 90.0))
    east = clip_ring_convex(ring_u, bbox_ring(180.0, -90.0, 360.0, 90.0))
    out = []
    if west is not None:
        out.append(west)
    if east is not None:
        east = east.copy()
        east[:, 0] -= 360.0
        out.append(east)
    return out


_ZONE_CELLS_CACHE: dict[tuple, set[tuple[int, int]]] = {}


def _tiles_for_zone(
    cc: str,
    roi_rings: list[np.ndarray],
    tiling_id: str,
    *,
    variant: str = "std",
) -> set[tuple[int, int]]:
    """Cells of `tiling_id` intersecting proj(ROI ∩ zone) for one zone.

    Memoized per (zone, level, ROI) — repeated searches (e.g. the global
    catalog query) are driver-side hot spots otherwise.
    """
    import hashlib

    roi_key = hashlib.sha1(b"".join(np.ascontiguousarray(r).tobytes() for r in roi_rings)).hexdigest()
    cache_key = (cc, tiling_id, variant, roi_key)
    hit = _ZONE_CELLS_CACHE.get(cache_key)
    if hit is not None:
        return hit
    cells = _tiles_for_zone_uncached(cc, roi_rings, tiling_id, variant=variant)
    if len(_ZONE_CELLS_CACHE) > 256:
        _ZONE_CELLS_CACHE.clear()
    _ZONE_CELLS_CACHE[cache_key] = cells
    return cells


def _tiles_for_zone_uncached(
    cc: str,
    roi_rings: list[np.ndarray],
    tiling_id: str,
    *,
    variant: str = "std",
) -> set[tuple[int, int]]:
    ts = float(TILING_ID_TO_SIZE[tiling_id])
    polys = load_zone_polys(variant)[cc]
    cells: set[tuple[int, int]] = set()
    for rings in polys:
        exterior = rings[0]
        for roi_ring in roi_rings:
            clipped = clip_ring_convex(exterior, roi_ring)
            if clipped is None:
                continue
            dense = densify_ring(clipped, DEF_SEG_LEN_DEG)
            x, y = aeqd_forward(cc, dense[:, 0], dense[:, 1])
            proj_ring = np.column_stack([x, y])
            ix, iy, _ = cells_intersecting_polys([[proj_ring]], ts)
            cells.update(zip(ix.tolist(), iy.tolist()))
    return cells


def _emit(
    cells: set[tuple[int, int]],
    cc: str,
    tiling_id: str,
    *,
    cover_land: bool,
    variant: str = "std",
) -> list[TileRecord]:
    cat = catalog_cells(cc, tiling_id, variant)
    ts = float(TILING_ID_TO_SIZE[tiling_id])
    out = []
    for ix, iy in sorted(cells):
        hit = cat.get((ix, iy))
        if hit is None:
            continue  # marking slop outside the zone polygon
        name, covers = hit
        if cover_land and not covers:
            continue
        out.append(TileRecord(cc, name, ix * ts, iy * ts, ts, covers))
    return out


def get_tiles_in_geog_bbox(
    bbox: tuple[float, float, float, float],
    tiling_id: str,
    *,
    cover_land: bool = False,
    grid: GridConfig | None = None,
) -> list[TileRecord]:
    """All tiles of `tiling_id` intersecting the geographic bbox.

    Output order: continents in system_order, then x-major / y-ascending
    (reference golden tests/test_equi7grid.py:273-282).
    """
    grid = grid or GridConfig()
    variant = "bfrd" if grid.buffered else "std"
    roi_rings = _roi_rings_from_bbox(bbox)
    out: list[TileRecord] = []
    for cc in grid.system_order:
        cells = _tiles_for_zone(cc, roi_rings, tiling_id, variant=variant)
        out.extend(_emit(cells, cc, tiling_id, cover_land=cover_land, variant=variant))
    return out


def get_tiles_in_geom(
    points_lonlat: np.ndarray,
    tiling_id: str,
    *,
    cover_land: bool = False,
    grid: GridConfig | None = None,
) -> list[TileRecord]:
    """All tiles intersecting a (convex) lon/lat polygon ROI
    (reference get_tiles_in_geom, core.py:263-290,488-518)."""
    grid = grid or GridConfig()
    variant = "bfrd" if grid.buffered else "std"
    roi_rings = _roi_rings_from_lonlat_polygon(np.asarray(points_lonlat, np.float64))
    out: list[TileRecord] = []
    for cc in grid.system_order:
        cells = _tiles_for_zone(cc, roi_rings, tiling_id, variant=variant)
        out.extend(_emit(cells, cc, tiling_id, cover_land=cover_land, variant=variant))
    return out


def get_tiles_in_xy_bbox(
    subgrid: str,
    bbox: tuple[float, float, float, float],
    tiling_id: str,
    *,
    cover_land: bool = False,
) -> list[TileRecord]:
    """Tiles of one continent intersecting a *projected* bbox
    (reference get_tiles_in_bbox, golden tests/test_equi7grid.py:388-402).
    Pure integer range enumeration + zone-catalog filter."""
    ts = float(TILING_ID_TO_SIZE[tiling_id])
    x_min, y_min, x_max, y_max = bbox
    ix0 = int(np.floor(x_min / ts))
    ix1 = int(np.floor(x_max / ts)) if x_max % ts != 0 else int(x_max // ts)
    iy0 = int(np.floor(y_min / ts))
    iy1 = int(np.floor(y_max / ts)) if y_max % ts != 0 else int(y_max // ts)
    cells = {(ix, iy) for ix in range(ix0, ix1 + 1) for iy in range(iy0, iy1 + 1)}
    return _emit(cells, subgrid, tiling_id, cover_land=cover_land)
