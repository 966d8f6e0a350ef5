"""Grid-level Python API facade — the reference's `Equi7Grid` surface
(reference core.py:359-648) re-expressed over the engine.

A user of the reference can call the same operations here:
``get_standard_equi7grid(500).EU.lonlat_to_xy(...)``-style access is
provided as ``grid.lonlat_to_xy(...)`` / ``grid.system("EU")``; tile
search, naming algebra and distortion match the reference goldens
(tests/test_api.py ports the reference suite 1:1 at this level). The
Spark operators (operators/, queries.py) are the distributed
counterparts of every method here.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from equi7grid_spark.constants import (
    GridConfig,
    RegularTilingDefinition,
    SYSTEMS,
    make_grid_config,
    make_user_grid_config,
)
from equi7grid_spark.geodesy import (
    aeqd_forward,
    aeqd_inverse,
    length_distortion_ellipsoid,
    length_distortion_planar,
)
from equi7grid_spark.roi import (
    TileRecord,
    get_tiles_in_geog_bbox,
    get_tiles_in_geom,
    get_tiles_in_xy_bbox,
)
from equi7grid_spark.tile import GeomOutOfZoneError, Tile, TileOutOfZoneError
from equi7grid_spark.zones import zone_membership

__all__ = [
    "Equi7Grid",
    "Equi7TilingSystem",
    "GeomOutOfZoneError",
    "Tile",
    "TileOutOfZoneError",
    "RegularTilingDefinition",
    "get_standard_equi7grid",
    "get_user_equi7grid",
]


@dataclass(frozen=True)
class Equi7TilingSystem:
    """One continental system (reference Equi7TilingSystem, core.py:55-356)."""

    name: str
    grid: "Equi7Grid"

    @property
    def epsg(self) -> int:
        return SYSTEMS[self.name].epsg

    def lonlat_to_xy(self, lon: float, lat: float) -> tuple[float, float]:
        x, y = aeqd_forward(self.name, lon, lat)
        return float(x), float(y)

    def xy_to_lonlat(self, x: float, y: float) -> tuple[float, float]:
        lon, lat = aeqd_inverse(self.name, x, y)
        return float(lon), float(lat)

    def calc_length_distortion(self, x, y):
        return length_distortion_planar(self.name, x, y)

    def contains_lonlat(self, lon: float, lat: float) -> bool:
        m = zone_membership(
            np.array([lon]), np.array([lat]),
            buffered=self.grid.config.buffered, system_order=(self.name,),
        )
        return bool(m[0, 0])

    def get_tile_from_xy(self, x: float, y: float, tiling_id: str = "T6") -> Tile:
        return Tile.from_xy(self.name, x, y, tiling_id, self.grid.sampling_of(tiling_id))

    def get_tile_from_lonlat(self, lon: float, lat: float, tiling_id: str = "T6") -> Tile:
        x, y = self.lonlat_to_xy(lon, lat)
        return self.get_tile_from_xy(x, y, tiling_id)

    def get_tile_from_name(self, ftilename: str) -> Tile:
        t = Tile.from_name(ftilename, self.grid.sampling_of("T" + ftilename[-1]))
        if t.subgrid != self.name:
            raise ValueError(f"{ftilename} is not a {self.name} tile")
        return t

    def get_tiles_in_bbox(self, bbox, tiling_id: str = "T6", *, cover_land: bool = False):
        recs = get_tiles_in_xy_bbox(self.name, tuple(bbox), tiling_id, cover_land=cover_land)
        return self.grid._to_tiles(recs, tiling_id)

    def _all_tiles(self, tiling_id: str = "T6", *, cover_land: bool = False) -> list[Tile]:
        """Every tile of this system at `tiling_id` (the system's tile
        catalog, reference Equi7TilingSystem tile enumeration)."""
        from equi7grid_spark.catalog import catalog_cells
        from equi7grid_spark.constants import TILING_ID_TO_SIZE

        variant = "bfrd" if self.grid.config.buffered else "std"
        ts = float(TILING_ID_TO_SIZE[tiling_id])
        s = self.grid.sampling_of(tiling_id)
        out = []
        for (ix, iy), (_, covers) in sorted(
            catalog_cells(self.name, tiling_id, variant).items()
        ):
            if cover_land and not covers:
                continue
            out.append(Tile(self.name, tiling_id, ix * ts, iy * ts, s))
        return out

    def to_ogc_json(self, tiling_id: str = "T6", *, cover_land: bool = False) -> dict:
        """GeoJSON FeatureCollection of this system's tile footprints
        (reference export, docs/guides/tiling_system.ipynb)."""
        from equi7grid_spark.export import tiles_to_ogc_json

        return tiles_to_ogc_json(self._all_tiles(tiling_id, cover_land=cover_land))

    def to_shapefile(self, path, tiling_id: str = "T6", *, cover_land: bool = False) -> None:
        """ESRI shapefile of this system's tile footprints (reference
        to_shapefile, docs/guides/tiling_system.ipynb:331)."""
        from equi7grid_spark.export import tiles_to_shapefile

        tiles_to_shapefile(self._all_tiles(tiling_id, cover_land=cover_land), path)

    def get_children_from_name(self, ftilename: str) -> list[Tile]:
        return self.get_tile_from_name(ftilename).children()

    def get_parent_from_name(self, ftilename: str) -> Tile:
        return self.get_tile_from_name(ftilename).parent()


class Equi7Grid:
    """All seven systems (reference Equi7Grid, core.py:359-535)."""

    def __init__(self, config: GridConfig):
        self.config = config
        for cc in config.system_order:
            setattr(self, cc, Equi7TilingSystem(cc, self))

    # -- access ---------------------------------------------------------
    def system(self, cc: str) -> Equi7TilingSystem:
        if cc not in self.config.system_order:
            raise KeyError(cc)
        return getattr(self, cc)

    __getitem__ = system

    @property
    def system_order(self) -> tuple[str, ...]:
        return self.config.system_order

    def sampling_of(self, tiling_id: str) -> float:
        s = self.config.sampling.get(tiling_id)
        if s is None:
            raise KeyError(f"no sampling configured for {tiling_id}")
        return s

    # -- point routing ----------------------------------------------------
    def get_systems_from_lonlat(self, lon: float, lat: float) -> list[str]:
        """reference core.py:436 — containing systems in system_order."""
        m = zone_membership(
            np.array([lon]), np.array([lat]),
            buffered=self.config.buffered, system_order=self.config.system_order,
        )[0]
        return [cc for cc, hit in zip(self.config.system_order, m) if hit]

    def lonlat_to_xy(self, lon: float, lat: float) -> dict[str, tuple[float, float]]:
        """reference semantics (tests/test_equi7grid.py:405-439): dict in
        system order; GeomOutOfZoneError if no zone contains the point."""
        systems = self.get_systems_from_lonlat(lon, lat)
        if not systems:
            raise GeomOutOfZoneError(f"({lon}, {lat}) outside configured zones")
        return {cc: self.system(cc).lonlat_to_xy(lon, lat) for cc in systems}

    def calc_length_distortion_on_ellipsoid(self, lon: float, lat: float) -> float:
        systems = self.get_systems_from_lonlat(lon, lat)
        if not systems:
            raise GeomOutOfZoneError(f"({lon}, {lat})")
        return float(length_distortion_ellipsoid(systems[0], lon, lat))

    # -- tiles --------------------------------------------------------------
    def get_tile_from_name(self, ftilename: str) -> Tile:
        return self.system(ftilename[:2]).get_tile_from_name(ftilename)

    def _to_tiles(self, recs: list[TileRecord], tiling_id: str) -> list[Tile]:
        s = self.sampling_of(tiling_id)
        return [Tile(r.subgrid, tiling_id, r.ll_x, r.ll_y, s) for r in recs]

    def get_tiles_in_geog_bbox(
        self, bbox, tiling_id: str = "T6", *, cover_land: bool = False
    ) -> list[Tile]:
        recs = get_tiles_in_geog_bbox(
            tuple(bbox), tiling_id, cover_land=cover_land, grid=self.config
        )
        return self._to_tiles(recs, tiling_id)

    def get_tiles_in_geom(
        self, points_lonlat, tiling_id: str = "T6", *, cover_land: bool = False
    ) -> list[Tile]:
        recs = get_tiles_in_geom(
            np.asarray(points_lonlat, np.float64), tiling_id,
            cover_land=cover_land, grid=self.config,
        )
        return self._to_tiles(recs, tiling_id)

    def search_tiles(
        self,
        *,
        geog_bbox=None,
        roi_geom=None,
        xy_bbox=None,
        subgrid: str | None = None,
        tiling_id: str = "T6",
        cover_land: bool = False,
    ) -> list[Tile]:
        """ROI dispatcher (reference get_overlapping_tiles, warp.py:333-401):
        exactly one of geog_bbox / roi_geom / (subgrid + xy_bbox).

        ``cover_land=True`` filters on the per-tile ``covers_land`` flag.
        NOTE: that flag is engine-defined — the reference's
        land.parquet blob is absent from its own checkout
        (/root/reference/.MISSING_LARGE_BLOBS:2), so the shipped
        artifacts carry a deterministic synthetic mask
        (equi7grid_spark/land.py). To use real land-cover data, set
        ``EQUI7_LAND_GEOJSON`` to a GeoJSON land-polygon file (e.g. a
        Natural Earth download) and rebuild the artifacts with
        scripts/prepare_data.py; the flag's semantics (tile extent
        intersects land ∩ zone, sampled per tile) are unchanged."""
        given = [g is not None for g in (geog_bbox, roi_geom, xy_bbox)]
        if sum(given) != 1:
            raise ValueError("provide exactly one of geog_bbox, roi_geom, xy_bbox")
        if geog_bbox is not None:
            return self.get_tiles_in_geog_bbox(geog_bbox, tiling_id, cover_land=cover_land)
        if roi_geom is not None:
            return self.get_tiles_in_geom(roi_geom, tiling_id, cover_land=cover_land)
        if subgrid is None:
            raise ValueError("xy_bbox requires subgrid")
        return self.system(subgrid).get_tiles_in_bbox(xy_bbox, tiling_id, cover_land=cover_land)

    def ftilenames_to_tiles(self, names: list[str]) -> list[Tile]:
        """reference warp.py:404-420 — names → validated tiles."""
        return [self.get_tile_from_name(n) for n in names]

    # -- (de)serialization (reference core.py:605-648, docs/guides/grid.ipynb)
    def to_grid_def(self, path=None) -> dict:
        """Grid definition as a dict; with `path`, also written as JSON
        (reference to_grid_def(json_path), docs/guides/grid.ipynb)."""
        from equi7grid_spark.grids import grid_to_def

        d = grid_to_def(self.config)
        if path is not None:
            import json
            from pathlib import Path as _P

            _P(path).write_text(json.dumps(d, indent=2))
        return d

    def to_file(self, path) -> None:
        from equi7grid_spark.grids import grid_to_file

        grid_to_file(self.config, path)

    @classmethod
    def from_file(cls, path) -> "Equi7Grid":
        from equi7grid_spark.grids import grid_from_file

        return cls(grid_from_file(path))

    @classmethod
    def from_grid_def(cls, d: dict) -> "Equi7Grid":
        from equi7grid_spark.grids import grid_from_def

        return cls(grid_from_def(d))


def get_standard_equi7grid(
    sampling, *, buffered: bool = False, continent_order: list[str] | None = None
) -> Equi7Grid:
    """reference core.py:572-602."""
    return Equi7Grid(
        make_grid_config(sampling, buffered=buffered, continent_order=continent_order)
    )


def get_user_equi7grid(
    sampling,
    tiling_defs: dict[int, RegularTilingDefinition],
    *,
    buffered: bool = False,
    continent_order: list[str] | None = None,
) -> Equi7Grid:
    """User-defined tiling levels over the seven Equi7 systems
    (reference get_user_equi7grid, core.py:538-569; e.g. a T2 = 200 km
    grid, docs/guides/grid.ipynb). Tile catalogs for the new levels are
    computed on the fly (catalog.computed_cells); all tile algebra —
    naming, parsing, ROI search, Spark assignment — resolves the new
    ids through the tiling registry."""
    return Equi7Grid(
        make_user_grid_config(
            sampling, tiling_defs, buffered=buffered, continent_order=continent_order
        )
    )
