"""Tile algebra as pure Spark Columns (JVM-side, whole-stage codegen).

Everything here is SQL-expressible arithmetic — floor tiling, tilename
formatting/parsing, parent/children closure, pixel<->world transforms,
planar distortion — so Catalyst codegens it and DuckDB can oracle it.
Semantics pinned to the reference:

- naming: ``{CC}_E{int(ll_x/1e5):03}{N|S}{abs(int(ll_y/1e5)):03}T{n}``
  (reference core.py:109-151)
- parsing + modulus validity (reference core.py:172-207)
- children/parent (reference core.py:326-356)
- rc2xy/xy2rc with px_origin in {ll,ul,ur,lr,c}, default 'll'
  (reference core.py:43; tests/test_equi7grid.py:120-151)
- planar distortion k = d/a/sin(d/a) (reference core.py:292-324)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from equi7grid_spark.constants import SYSTEMS, TILING_ID_TO_SIZE, WGS84_A


def tile_ll(coord: Column, tile_size: float) -> Column:
    """Lower-left corner of the containing tile along one axis (meters)."""
    return F.floor(coord / F.lit(float(tile_size))) * F.lit(float(tile_size))


def tilename(subgrid: Column, ll_x: Column, ll_y: Column, tiling_id: str) -> Column:
    """Full tilename from the tile lower-left corner in meters."""
    tx = (ll_x / F.lit(1e5)).cast("int")
    ty = (ll_y / F.lit(1e5)).cast("int")
    ns = F.when(ll_y < 0, F.lit("S")).otherwise(F.lit("N"))
    return F.format_string(
        "%s_E%03d%s%03dT%s", subgrid, tx, ns, F.abs(ty), F.lit(tiling_id[1:])
    )


def tilename_at(subgrid: Column, x: Column, y: Column, tiling_id: str) -> Column:
    """Tilename of the tile containing projected point (x, y)."""
    ts = float(TILING_ID_TO_SIZE[tiling_id])
    return tilename(subgrid, tile_ll(x, ts), tile_ll(y, ts), tiling_id)


_NAME_RE = r"^([A-Z]{2})_E(\d{3})([NS])(\d{3})T(\d)$"


def parse_tilename(name: Column) -> Column:
    """Parse a full tilename into a struct.

    Fields: subgrid, tiling_id, ll_x, ll_y (meters), valid (modulus
    check, reference core.py:197 — ValueError there, boolean here;
    zone containment is a separate catalog join).
    """
    subgrid = F.regexp_extract(name, _NAME_RE, 1)
    ex = F.regexp_extract(name, _NAME_RE, 2).cast("double") * F.lit(1e5)
    ns = F.regexp_extract(name, _NAME_RE, 3)
    ny = F.regexp_extract(name, _NAME_RE, 4).cast("double") * F.lit(1e5)
    tnum = F.regexp_extract(name, _NAME_RE, 5)
    ll_y = F.when(ns == "S", -ny).otherwise(ny)
    tiling_id = F.concat(F.lit("T"), tnum)
    ts = tnum.cast("double") * F.lit(1e5)
    matched = subgrid != ""
    valid = matched & (ex % ts == 0) & (ll_y % ts == 0)
    return F.struct(
        subgrid.alias("subgrid"),
        tiling_id.alias("tiling_id"),
        ex.alias("ll_x"),
        ll_y.alias("ll_y"),
        valid.alias("valid"),
    )


def children(ll_x: Column, ll_y: Column, parent_id: str, child_id: str) -> Column:
    """Array of child-tile lower-left struct(ll_x, ll_y) at the next
    higher level (reference core.py:326-340: T6→4×T3, T3→9×T1)."""
    pts = float(TILING_ID_TO_SIZE[parent_id])
    cts = float(TILING_ID_TO_SIZE[child_id])
    ratio = int(round(pts / cts))
    offs = [(i * cts, j * cts) for i in range(ratio) for j in range(ratio)]
    return F.array(
        *[
            F.struct(
                (ll_x + F.lit(dx)).alias("ll_x"),
                (ll_y + F.lit(dy)).alias("ll_y"),
            )
            for dx, dy in offs
        ]
    )


def parent_ll(ll: Column, parent_id: str) -> Column:
    """Lower-left coordinate of the containing parent tile
    (reference core.py:342-356)."""
    return tile_ll(ll, float(TILING_ID_TO_SIZE[parent_id]))


def xy2rc(
    x: Column, y: Column, ll_x: Column, ll_y: Column, tile_size: float, sampling: float
) -> tuple[Column, Column]:
    """World meters → pixel (row, col) in the tile
    (r = floor((y_max−y)/s), c = floor((x−x_min)/s);
    reference goldens tests/test_equi7grid.py:145-151,164-174)."""
    y_max = ll_y + F.lit(float(tile_size))
    r = F.floor((y_max - y) / F.lit(float(sampling))).cast("int")
    c = F.floor((x - ll_x) / F.lit(float(sampling))).cast("int")
    return r, c


def rc2xy(
    r: Column,
    c: Column,
    ll_x: Column,
    ll_y: Column,
    tile_size: float,
    sampling: float,
    px_origin: str = "ll",
) -> tuple[Column, Column]:
    """Pixel (row, col) → world meters at the chosen pixel anchor
    (default 'll', reference core.py:43; goldens
    tests/test_equi7grid.py:120-142)."""
    s = F.lit(float(sampling))
    y_max = ll_y + F.lit(float(tile_size))
    if px_origin == "ll":
        x = ll_x + c * s
        y = y_max - (r + F.lit(1)) * s
    elif px_origin == "ul":
        x = ll_x + c * s
        y = y_max - r * s
    elif px_origin == "lr":
        x = ll_x + (c + F.lit(1)) * s
        y = y_max - (r + F.lit(1)) * s
    elif px_origin == "ur":
        x = ll_x + (c + F.lit(1)) * s
        y = y_max - r * s
    elif px_origin == "c":
        x = ll_x + c * s + s / 2
        y = y_max - r * s - s / 2
    else:
        raise ValueError(f"unknown px_origin {px_origin!r}")
    return x, y


def _per_system(col_of_sys: dict[str, float], subgrid: Column) -> Column:
    """Chain of whens selecting a per-system constant (7 branches,
    codegen'd; no UDF)."""
    items = list(col_of_sys.items())
    expr = F.lit(items[0][1])
    out = F.when(subgrid == items[0][0], F.lit(items[0][1]))
    for cc, v in items[1:]:
        out = out.when(subgrid == cc, F.lit(v))
    return out


def length_distortion_planar(subgrid: Column, x: Column, y: Column) -> Column:
    """k = d/a/sin(d/a), d = planar distance from the projection center
    (reference core.py:292-324). Pure Column expression."""
    x0 = _per_system({cc: s.x_0 for cc, s in SYSTEMS.items()}, subgrid)
    y0 = _per_system({cc: s.y_0 for cc, s in SYSTEMS.items()}, subgrid)
    d = F.sqrt((x - x0) * (x - x0) + (y - y0) * (y - y0))
    a = F.lit(WGS84_A)
    return F.when(d == 0, F.lit(1.0)).otherwise(d / a / F.sin(d / a))


def tile_extent(
    ll_x: Column, ll_y: Column, tile_size: float
) -> tuple[Column, Column, Column, Column]:
    """outer_boundary_extent = (x_min, y_min, x_max, y_max)
    (reference golden tests/test_equi7grid.py:154-158)."""
    ts = F.lit(float(tile_size))
    return ll_x, ll_y, ll_x + ts, ll_y + ts


def coord_extent(
    ll_x: Column, ll_y: Column, tile_size: float, sampling: float
) -> tuple[Column, Column, Column, Column]:
    """Extent of pixel anchor ('ll') coordinates
    (golden: (4.8e6,1.2e6,5399500,1799500) for EU_E048N012T6@500m)."""
    ts = F.lit(float(tile_size))
    s = F.lit(float(sampling))
    return ll_x, ll_y, ll_x + ts - s, ll_y + ts - s


def geotrans(
    ll_x: Column, ll_y: Column, tile_size: float, sampling: float
) -> Column:
    """GDAL-style geotransform (x_min, s, 0, y_max, 0, -s)
    (reference warp.py:291, docs/howto.ipynb)."""
    return F.array(
        ll_x,
        F.lit(float(sampling)),
        F.lit(0.0),
        ll_y + F.lit(float(tile_size)),
        F.lit(0.0),
        F.lit(-float(sampling)),
    )


_MORTON_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _morton_spread(v: Column, bits: int) -> Column:
    """Spread the low `bits` bits of v so bit i lands at bit 2i
    (magic-number interleave, 5 shift/mask steps instead of a per-bit
    unroll — a small fixed expression tree Catalyst codegens)."""
    out = v.bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _MORTON_SPREAD:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def morton_key(x_idx: Column, y_idx: Column, bits: int = 16) -> Column:
    """Z-order (Morton) key interleaving two non-negative integer tile
    indices: bit i of x lands at bit 2i, bit i of y at 2i+1. Sorting by
    this key places 2D-adjacent tiles in adjacent rows, so
    ``compact(sort_cols=[...])`` over a ``morton_key`` column clusters
    a tile table SPATIALLY: rolled files and parquet row groups cover
    compact 2D neighborhoods and a bbox/ROI range scan touches few of
    them (Iceberg's z-ordered rewrite, the standard layout for
    100 TB geospatial tables). `bits` caps each index (default 16 —
    65k tiles per axis; an Equi7 T1 axis spans < 200); with bits <= 31
    the key stays below bit 62, inside both Spark's and DuckDB's safe
    BIGINT shift range. Pure Column expression (10 shift/mask steps),
    whole-stage-codegen friendly."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    return _morton_spread(x_idx.cast("long"), bits).bitwiseOR(
        F.shiftleft(_morton_spread(y_idx.cast("long"), bits), 1)
    )
