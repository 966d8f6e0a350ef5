"""Equi7Grid projection-system and tiling constants.

Seven continental azimuthal-equidistant (AEQD) projection systems on the
WGS84 ellipsoid (EPSG:27701-27707) plus the standard T6/T3/T1 square
tilings. Parameter values reproduce the reference definitions at
/root/reference/src/equi7grid/_create_grids.py:21-100 and the PROJ4
strings in /root/reference/README.md:48-54; they are public constants of
the published Equi7Grid specification (Bauer-Marschallinger et al. 2014).

Everything in this module is plain-Python metadata, small enough to be
pickled into pandas-UDF closures / broadcast to every executor.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# WGS84 ellipsoid (public geodetic constants).
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)


@dataclass(frozen=True)
class ProjSystem:
    """One continental AEQD projection system.

    ``lat_0``/``lon_0`` are the projection center, ``x_0``/``y_0`` the
    false easting/northing, ``min_xy`` the tiling anchor (reference
    _create_grids.py:44-80).
    """

    name: str
    epsg: int
    lat_0: float
    lon_0: float
    x_0: float
    y_0: float
    min_xy: tuple[float, float]


# Insertion order matters: it is the default `system_order`
# (reference _create_grids.py:83-91 → AF, AN, AS, EU, OC, NA, SA).
SYSTEMS: dict[str, ProjSystem] = {
    "AF": ProjSystem("AF", 27701, 8.5, 21.5, 5621452.01998, 5990638.42298, (0.0, 0.0)),
    "AN": ProjSystem("AN", 27702, -90.0, 0.0, 3714266.97719, 3402016.50625, (0.0, 0.0)),
    "AS": ProjSystem("AS", 27703, 47.0, 94.0, 4340913.84808, 4812712.92347, (0.0, -1_800_000.0)),
    "EU": ProjSystem("EU", 27704, 53.0, 24.0, 5837287.81977, 2121415.69617, (0.0, -600_000.0)),
    "OC": ProjSystem("OC", 27706, -19.5, 131.5, 6988408.5356, 7654884.53733, (0.0, 0.0)),
    "NA": ProjSystem("NA", 27705, 52.0, -97.5, 8264722.17686, 4867518.35323, (0.0, 0.0)),
    "SA": ProjSystem("SA", 27707, -14.0, -60.5, 7257179.23559, 5592024.44605, (0.0, 0.0)),
}

DEFAULT_SYSTEM_ORDER: tuple[str, ...] = tuple(SYSTEMS)  # AF AN AS EU OC NA SA

# Standard tiling levels: level -> (tiling_id, tile size in meters)
# (reference _create_grids.py:94-100).
STANDARD_TILINGS: dict[int, tuple[str, int]] = {
    1: ("T6", 600_000),
    2: ("T3", 300_000),
    3: ("T1", 100_000),
}

TILING_ID_TO_LEVEL: dict[str, int] = {tid: lvl for lvl, (tid, _) in STANDARD_TILINGS.items()}
# Registry of tiling id -> tile size in meters. Seeded with the
# standard levels; user tilings (reference get_user_equi7grid,
# core.py:538-569) register here so tilename parse/format, Tile
# construction and the Spark operators resolve them uniformly.
TILING_ID_TO_SIZE: dict[str, int] = {tid: size for _, (tid, size) in STANDARD_TILINGS.items()}


@dataclass(frozen=True)
class RegularTilingDefinition:
    """A named square tiling level (mirrors pytileproj's
    RegularTilingDefinition as used by the reference's
    get_user_equi7grid, docs/guides/grid.ipynb: e.g.
    RegularTilingDefinition(name="T2", tile_shape=200_000))."""

    name: str
    tile_shape: int

    def __post_init__(self) -> None:
        import re

        if not re.fullmatch(r"T\d", self.name):
            raise ValueError(
                f"tiling name {self.name!r} must be 'T' + one digit "
                "(the tilename layout reserves one character)"
            )
        if self.tile_shape <= 0 or self.tile_shape % 100_000 != 0:
            raise ValueError(
                f"tile_shape {self.tile_shape} must be a positive multiple "
                "of 100 km (tilenames encode the corner in 100 km units)"
            )


def register_tiling(name: str, tile_shape: int) -> None:
    """Register a tiling id globally (idempotent; conflicting re-use of
    a standard id is rejected)."""
    d = RegularTilingDefinition(name, int(tile_shape))
    existing = TILING_ID_TO_SIZE.get(d.name)
    if existing is not None and existing != d.tile_shape:
        raise ValueError(
            f"tiling id {d.name!r} already registered with size {existing}"
        )
    TILING_ID_TO_SIZE[d.name] = d.tile_shape

# Densification segment length for reprojecting polygon boundaries,
# degrees (reference pytileproj DEF_SEG_LEN_DEG, imported core.py:25).
DEF_SEG_LEN_DEG = 0.1

# Default pixel anchor for tile pixel<->world transforms
# (reference core.py:43, CHANGELOG v1.1.0: lower-left origin).
DEFAULT_PX_ORIGIN = "ll"


@dataclass(frozen=True)
class GridConfig:
    """A fully resolved grid: sampling per tiling id + system order.

    Mirrors `get_standard_equi7grid(sampling, buffered, continent_order)`
    (reference core.py:572-602). `sampling` maps tiling_id -> pixel size;
    a partial user map drops the other levels, matching the reference's
    documented behavior (docs/guides/grid.ipynb).
    """

    sampling: dict[str, float] = field(default_factory=dict)
    buffered: bool = False
    system_order: tuple[str, ...] = DEFAULT_SYSTEM_ORDER
    tilings: dict[str, int] = field(default_factory=lambda: dict(TILING_ID_TO_SIZE))

    def n_pixels(self, tiling_id: str) -> int:
        size = self.tilings[tiling_id]
        s = self.sampling[tiling_id]
        n = size / s
        if abs(n - round(n)) > 1e-9:
            raise ValueError(f"sampling {s} does not divide tile size {size}")
        return int(round(n))


def make_grid_config(
    sampling: float | int | dict[str, float],
    *,
    buffered: bool = False,
    continent_order: list[str] | None = None,
) -> GridConfig:
    """Build a GridConfig the way `get_standard_equi7grid` does."""
    if isinstance(sampling, dict):
        smap = {tid: float(s) for tid, s in sampling.items()}
        tilings = {tid: TILING_ID_TO_SIZE[tid] for tid in smap}
    else:
        smap = {tid: float(sampling) for tid in TILING_ID_TO_SIZE}
        tilings = dict(TILING_ID_TO_SIZE)
    order = tuple(continent_order) if continent_order else DEFAULT_SYSTEM_ORDER
    unknown = [c for c in order if c not in SYSTEMS]
    if unknown:
        raise ValueError(f"unknown continents: {unknown}")
    return GridConfig(sampling=smap, buffered=buffered, system_order=order, tilings=tilings)


def make_user_grid_config(
    sampling: float | int | dict[str, float],
    tiling_defs: dict[int, RegularTilingDefinition],
    *,
    buffered: bool = False,
    continent_order: list[str] | None = None,
) -> GridConfig:
    """Build a GridConfig from user tiling definitions the way the
    reference's `get_user_equi7grid` does (core.py:538-569;
    docs/guides/grid.ipynb builds a T2 = 200 km grid). `tiling_defs`
    maps level -> RegularTilingDefinition; `sampling` is a single pixel
    size for every level or a per-tiling-id map."""
    tilings: dict[str, int] = {}
    for _, d in sorted(tiling_defs.items()):
        register_tiling(d.name, d.tile_shape)
        tilings[d.name] = int(d.tile_shape)
    if isinstance(sampling, dict):
        smap = {tid: float(s) for tid, s in sampling.items()}
        unknown = [tid for tid in smap if tid not in tilings]
        if unknown:
            raise ValueError(f"sampling for undefined tilings: {unknown}")
        tilings = {tid: tilings[tid] for tid in smap}
    else:
        smap = {tid: float(sampling) for tid in tilings}
    for tid, s in smap.items():
        if (tilings[tid] / s) % 1 != 0:
            raise ValueError(f"sampling {s} does not divide tile size {tilings[tid]}")
    order = tuple(continent_order) if continent_order else DEFAULT_SYSTEM_ORDER
    unknown_cc = [c for c in order if c not in SYSTEMS]
    if unknown_cc:
        raise ValueError(f"unknown continents: {unknown_cc}")
    return GridConfig(sampling=smap, buffered=buffered, system_order=order, tilings=tilings)


def allowed_samplings(tile_size: float) -> list[float]:
    """All integer divisors of `tile_size` (reference core.py:651-665)."""
    ts = int(tile_size)
    return [float(d) for d in range(1, ts + 1) if ts % d == 0]
