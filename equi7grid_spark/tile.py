"""Driver-side Tile API — parity with the reference's Equi7Tile object
(reference core.py:39-52 and the RasterTile surface exercised in
docs/guides/tile.ipynb): extents, corners, pixel grids, geotransform,
pixel<->world transforms, topological predicates, children/parent,
validity. The Spark engine computes these as Columns
(functions/tiling.py); this object is the convenience/API layer for
driver code, ROI results and tests.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import cached_property

import numpy as np

from equi7grid_spark.catalog import catalog_cells
from equi7grid_spark.constants import (
    DEFAULT_PX_ORIGIN,
    SYSTEMS,
    TILING_ID_TO_SIZE,
)
from equi7grid_spark.geodesy import aeqd_forward, length_distortion_planar
from equi7grid_spark.geom import points_in_rings
from equi7grid_spark.zones import assign_primary_zone


class TileOutOfZoneError(ValueError):
    """Tile lies outside its continental zone (reference pytileproj
    TileOutOfZoneError, raised core.py:204-206,225-226)."""


class GeomOutOfZoneError(ValueError):
    """Point/geometry outside every configured zone (reference
    semantics, tests/test_equi7grid.py:421-428)."""


_NAME_LEN = 13


@dataclass(frozen=True)
class Tile:
    subgrid: str
    tiling_id: str
    ll_x: float
    ll_y: float
    sampling: float = 500.0
    px_origin: str = DEFAULT_PX_ORIGIN  # 'll', reference core.py:43

    # -- construction --------------------------------------------------
    @classmethod
    def from_name(cls, name: str, sampling: float = 500.0, *, validate: bool = True) -> "Tile":
        """Parse `CC_ExxxNyyyTn` (reference _name_to_tile, core.py:172-207):
        ValueError on bad modulus, TileOutOfZoneError outside the zone."""
        # layout: CC(0:2) _(2) E(3) xxx(4:7) N|S(7) yyy(8:11) T(11) n(12)
        if (
            len(name) != _NAME_LEN
            or name[2] != "_"
            or name[3] != "E"
            or name[7] not in "NS"
            or name[11] != "T"
        ):
            raise ValueError(f"invalid tilename {name!r}")
        subgrid = name[:2]
        if subgrid not in SYSTEMS:
            raise ValueError(f"unknown subgrid {subgrid!r}")
        x = float(name[4:7]) * 1e5
        sign = -1.0 if name[7] == "S" else 1.0
        y = float(name[8:11]) * 1e5 * sign
        tiling_id = "T" + name[12]
        ts = TILING_ID_TO_SIZE.get(tiling_id)
        if ts is None:
            raise ValueError(f"unknown tiling id {tiling_id!r}")
        if x % ts != 0 or y % ts != 0:
            raise ValueError(f"The given tilename '{name}' is not valid.")
        tile = cls(subgrid, tiling_id, x, y, sampling)
        if validate and not tile.in_zone:
            raise TileOutOfZoneError(name)
        return tile

    @classmethod
    def from_xy(cls, subgrid: str, x: float, y: float, tiling_id: str = "T6",
                sampling: float = 500.0) -> "Tile":
        ts = TILING_ID_TO_SIZE[tiling_id]
        return cls(subgrid, tiling_id, np.floor(x / ts) * ts, np.floor(y / ts) * ts, sampling)

    @classmethod
    def from_lonlat(cls, lon: float, lat: float, tiling_id: str = "T6",
                    sampling: float = 500.0) -> "Tile":
        """reference get_tile_from_lonlat (tests/test_equi7grid.py:164-174)."""
        sub = assign_primary_zone(np.array([lon]), np.array([lat]))[0]
        if sub == "":
            raise GeomOutOfZoneError(f"({lon}, {lat}) outside every zone")
        x, y = aeqd_forward(str(sub), lon, lat)
        return cls.from_xy(str(sub), float(x), float(y), tiling_id, sampling)

    # -- identity / validity -------------------------------------------
    @property
    def tile_size(self) -> float:
        return float(TILING_ID_TO_SIZE[self.tiling_id])

    @property
    def name(self) -> str:
        tx, ty = int(self.ll_x / 1e5), int(self.ll_y / 1e5)
        ns = "S" if ty < 0 else "N"
        return f"{self.subgrid}_E{tx:03d}{ns}{abs(ty):03d}T{self.tiling_id[1:]}"

    @cached_property
    def in_zone(self) -> bool:
        ts = self.tile_size
        key = (int(round(self.ll_x / ts)), int(round(self.ll_y / ts)))
        return key in catalog_cells(self.subgrid, self.tiling_id)

    @property
    def covers_land(self) -> bool:
        ts = self.tile_size
        key = (int(round(self.ll_x / ts)), int(round(self.ll_y / ts)))
        hit = catalog_cells(self.subgrid, self.tiling_id).get(key)
        return bool(hit and hit[1])

    # -- extents & grids -------------------------------------------------
    @property
    def outer_boundary_extent(self) -> tuple[float, float, float, float]:
        return (self.ll_x, self.ll_y, self.ll_x + self.tile_size, self.ll_y + self.tile_size)

    @property
    def coord_extent(self) -> tuple[float, float, float, float]:
        s = self.sampling
        x0, y0, x1, y1 = self.outer_boundary_extent
        return (x0, y0, x1 - s, y1 - s)

    @property
    def outer_boundary_corners(self):
        """(ll, lr, ur, ul) — index 0 is the lower-left corner
        (reference golden tests/test_equi7grid.py:218)."""
        x0, y0, x1, y1 = self.outer_boundary_extent
        return ((x0, y0), (x1, y0), (x1, y1), (x0, y1))

    @property
    def n_rows(self) -> int:
        return int(round(self.tile_size / self.sampling))

    n_cols = n_rows

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def x_size(self) -> float:
        return self.tile_size

    y_size = x_size

    @property
    def x_pixel_size(self) -> float:
        return self.sampling

    y_pixel_size = x_pixel_size

    @property
    def geotrans(self) -> tuple[float, float, float, float, float, float]:
        """(x_min, s, 0, y_max, 0, -s) — reference warp.py:291."""
        return (self.ll_x, self.sampling, 0.0, self.ll_y + self.tile_size, 0.0, -self.sampling)

    @property
    def x_coords(self) -> np.ndarray:
        """Pixel-anchor x coordinates ('ll' origin)."""
        return self.ll_x + np.arange(self.n_cols) * self.sampling

    @property
    def y_coords(self) -> np.ndarray:
        """Pixel-anchor y coordinates, row order (top to bottom, 'll')."""
        y_max = self.ll_y + self.tile_size
        return y_max - (np.arange(self.n_rows) + 1) * self.sampling

    def xy_coords(self) -> tuple[np.ndarray, np.ndarray]:
        return np.meshgrid(self.x_coords, self.y_coords)

    @property
    def boundary_wkt(self) -> str:
        (x0, y0), (x1, _), (_, y1), _ = (
            self.outer_boundary_corners[0],
            self.outer_boundary_corners[1],
            self.outer_boundary_corners[2],
            self.outer_boundary_corners[3],
        )
        return (
            f"POLYGON (({x0:.0f} {y0:.0f}, {x1:.0f} {y0:.0f}, "
            f"{x1:.0f} {y1:.0f}, {x0:.0f} {y1:.0f}, {x0:.0f} {y0:.0f}))"
        )

    # -- pixel <-> world --------------------------------------------------
    def rc2xy(self, r, c, px_origin: str | None = None):
        """reference goldens tests/test_equi7grid.py:120-142."""
        o = px_origin or self.px_origin
        s = self.sampling
        y_max = self.ll_y + self.tile_size
        r = np.asarray(r, np.float64)
        c = np.asarray(c, np.float64)
        if o == "ll":
            x, y = self.ll_x + c * s, y_max - (r + 1) * s
        elif o == "ul":
            x, y = self.ll_x + c * s, y_max - r * s
        elif o == "lr":
            x, y = self.ll_x + (c + 1) * s, y_max - (r + 1) * s
        elif o == "ur":
            x, y = self.ll_x + (c + 1) * s, y_max - r * s
        elif o == "c":
            x, y = self.ll_x + c * s + s / 2, y_max - r * s - s / 2
        else:
            raise ValueError(f"unknown px_origin {o!r}")
        return (float(x), float(y)) if np.isscalar(r) or x.ndim == 0 else (x, y)

    def xy2rc(self, x, y):
        """reference goldens tests/test_equi7grid.py:145-151."""
        s = self.sampling
        y_max = self.ll_y + self.tile_size
        r = np.floor((y_max - np.asarray(y, np.float64)) / s).astype(np.int64)
        c = np.floor((np.asarray(x, np.float64) - self.ll_x) / s).astype(np.int64)
        return (int(r), int(c)) if r.ndim == 0 else (r, c)

    # -- topology ----------------------------------------------------------
    def contains_xy(self, x: float, y: float) -> bool:
        x0, y0, x1, y1 = self.outer_boundary_extent
        return x0 <= x <= x1 and y0 <= y <= y1

    def intersects_extent(self, extent: tuple[float, float, float, float]) -> bool:
        x0, y0, x1, y1 = self.outer_boundary_extent
        a0, b0, a1, b1 = extent
        return not (a1 < x0 or a0 > x1 or b1 < y0 or b0 > y1)

    def overlaps_extent(self, extent: tuple[float, float, float, float]) -> bool:
        """Strict interior overlap without containment either way
        (shapely `overlaps` semantics, docs/guides/tile.ipynb)."""
        if not self.intersects_extent(extent) or self.touches_extent(extent):
            return False
        return not (self.within_extent(extent) or self.contains_extent(extent))

    def contains_extent(self, extent: tuple[float, float, float, float]) -> bool:
        x0, y0, x1, y1 = self.outer_boundary_extent
        a0, b0, a1, b1 = extent
        return x0 <= a0 and y0 <= b0 and a1 <= x1 and b1 <= y1

    def within_extent(self, extent: tuple[float, float, float, float]) -> bool:
        x0, y0, x1, y1 = self.outer_boundary_extent
        a0, b0, a1, b1 = extent
        return a0 <= x0 and b0 <= y0 and x1 <= a1 and y1 <= b1

    def touches_extent(self, extent: tuple[float, float, float, float]) -> bool:
        if not self.intersects_extent(extent):
            return False
        x0, y0, x1, y1 = self.outer_boundary_extent
        a0, b0, a1, b1 = extent
        return a1 == x0 or a0 == x1 or b1 == y0 or b0 == y1

    def intersects_polygon(self, ring: np.ndarray) -> bool:
        """Rect-vs-polygon intersects (projected coords)."""
        from equi7grid_spark.geom import boundary_cells

        r = np.asarray(ring, np.float64)
        x0, y0, x1, y1 = self.outer_boundary_extent
        if points_in_rings(np.array([(x0 + x1) / 2]), np.array([(y0 + y1) / 2]), [r])[0]:
            return True
        if ((r[:, 0] >= x0) & (r[:, 0] <= x1) & (r[:, 1] >= y0) & (r[:, 1] <= y1)).any():
            return True
        bx, by = boundary_cells([r], self.tile_size)
        ts = self.tile_size
        return any(
            int(round(x0 / ts)) == ix and int(round(y0 / ts)) == iy
            for ix, iy in zip(bx.tolist(), by.tolist())
        )

    # -- algebra -----------------------------------------------------------
    def children(self) -> list["Tile"]:
        """Next higher level (reference core.py:326-340)."""
        order = ["T6", "T3", "T1"]
        i = order.index(self.tiling_id)
        if i == len(order) - 1:
            raise ValueError(f"{self.tiling_id} has no finer standard level")
        child_id = order[i + 1]
        cts = TILING_ID_TO_SIZE[child_id]
        ratio = int(round(self.tile_size / cts))
        return [
            replace(self, tiling_id=child_id, ll_x=self.ll_x + i * cts, ll_y=self.ll_y + j * cts)
            for i in range(ratio)
            for j in range(ratio)
        ]

    def parent(self) -> "Tile":
        """Next lower level (reference core.py:342-356)."""
        order = ["T6", "T3", "T1"]
        i = order.index(self.tiling_id)
        if i == 0:
            raise ValueError(f"{self.tiling_id} has no coarser standard level")
        pid = order[i - 1]
        pts = TILING_ID_TO_SIZE[pid]
        return replace(
            self,
            tiling_id=pid,
            ll_x=float(np.floor(self.ll_x / pts) * pts),
            ll_y=float(np.floor(self.ll_y / pts) * pts),
        )

    def length_distortion(self, x, y):
        """Planar k at projected coords (reference core.py:292-324)."""
        return length_distortion_planar(self.subgrid, x, y)

    def __repr__(self) -> str:
        return self.name
