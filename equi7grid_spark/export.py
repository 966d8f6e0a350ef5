"""GeoParquet export of tile footprints (sink parity: the reference
exports tile geometries to shapefile/GeoDataFrame in its doc notebooks,
docs/guides/tiling_system.ipynb export cells).

Footprints are written as EPSG:4326 WKB polygons (tile rectangle
densified in projected space, then inverse-projected so edges follow
the true ground track) with minimal GeoParquet 1.0 `geo` metadata —
readable by geopandas/duckdb-spatial/any GeoParquet consumer.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from equi7grid_spark.geodesy import aeqd_inverse
from equi7grid_spark.geom import bbox_ring, densify_ring
from equi7grid_spark.wkb import polygon_wkb


def tile_footprint_lonlat(subgrid: str, ll_x: float, ll_y: float, tile_size: float,
                          seg_len_m: float = 30_000.0) -> np.ndarray:
    ring = densify_ring(
        bbox_ring(ll_x, ll_y, ll_x + tile_size, ll_y + tile_size), seg_len_m
    )
    lon, lat = aeqd_inverse(subgrid, ring[:, 0], ring[:, 1])
    return np.column_stack([lon, lat])


def tiles_to_ogc_json(tiles) -> dict:
    """GeoJSON FeatureCollection of tile footprints in lon/lat
    (reference `to_ogc_json` export, docs/guides/tiling_system.ipynb)."""
    feats = []
    for t in tiles:
        name = getattr(t, "tilename", None) or t.name
        ring = tile_footprint_lonlat(t.subgrid, t.ll_x, t.ll_y, t.tile_size)
        feats.append(
            {
                "type": "Feature",
                "properties": {
                    "tilename": name,
                    "subgrid": t.subgrid,
                    "covers_land": bool(getattr(t, "covers_land", False)),
                },
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[float(a), float(b)] for a, b in ring]],
                },
            }
        )
    return {"type": "FeatureCollection", "features": feats}


def tiles_to_geoparquet(tiles, path: str | Path) -> None:
    """`tiles`: iterable of objects with subgrid/tilename-or-name/
    ll_x/ll_y/tile_size (TileRecord or api.Tile)."""
    names, subgrids, wkbs, covers = [], [], [], []
    for t in tiles:
        name = getattr(t, "tilename", None) or t.name
        ring = tile_footprint_lonlat(t.subgrid, t.ll_x, t.ll_y, t.tile_size)
        names.append(name)
        subgrids.append(t.subgrid)
        wkbs.append(polygon_wkb([ring]))
        covers.append(bool(getattr(t, "covers_land", False)))
    geo_meta = {
        "version": "1.0.0",
        "primary_column": "geometry",
        "columns": {
            "geometry": {
                "encoding": "WKB",
                "geometry_types": ["Polygon"],
                "crs": None,  # GeoParquet default: OGC:CRS84 (lon/lat)
            }
        },
    }
    table = pa.table(
        {
            "tilename": pa.array(names, pa.string()),
            "subgrid": pa.array(subgrids, pa.string()),
            "covers_land": pa.array(covers, pa.bool_()),
            "geometry": pa.array(wkbs, pa.binary()),
        }
    )
    table = table.replace_schema_metadata({b"geo": json.dumps(geo_meta).encode()})
    pq.write_table(table, path)


_WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def _ensure_cw(ring: np.ndarray) -> np.ndarray:
    """Shapefile outer rings are clockwise (signed area < 0 in the
    x-right/y-up convention used by the spec)."""
    x, y = ring[:, 0], ring[:, 1]
    area2 = float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    return ring[::-1] if area2 > 0 else ring


def tiles_to_shapefile(tiles, path: str | Path) -> None:
    """Minimal ESRI Shapefile writer for tile footprints (reference
    `to_shapefile`, docs/guides/tiling_system.ipynb:331): writes
    .shp/.shx/.dbf/.prj with one EPSG:4326 polygon per tile and
    TILENAME/SUBGRID/LAND attributes. Stdlib+numpy only; round-tripped
    by tests/test_export_shapefile.py."""
    import struct

    path = Path(path)
    base = path.with_suffix("")
    recs = []
    for t in tiles:
        name = getattr(t, "tilename", None) or t.name
        ring = tile_footprint_lonlat(t.subgrid, t.ll_x, t.ll_y, t.tile_size)
        if not (ring[0] == ring[-1]).all():
            ring = np.vstack([ring, ring[:1]])
        recs.append((name, t.subgrid, bool(getattr(t, "covers_land", False)),
                     _ensure_cw(ring)))

    # --- .shp + .shx ---------------------------------------------------
    shp_records = []
    shx_entries = []
    offset_words = 50  # header = 100 bytes
    for i, (_, _, _, ring) in enumerate(recs, start=1):
        n = ring.shape[0]
        bx0, by0 = ring.min(axis=0)
        bx1, by1 = ring.max(axis=0)
        content = struct.pack("<i", 5)  # polygon
        content += struct.pack("<4d", bx0, by0, bx1, by1)
        content += struct.pack("<2i", 1, n)  # numParts, numPoints
        content += struct.pack("<i", 0)  # part 0 offset
        content += ring.astype("<f8").tobytes()
        clen_words = len(content) // 2
        shp_records.append(struct.pack(">2i", i, clen_words) + content)
        shx_entries.append(struct.pack(">2i", offset_words, clen_words))
        offset_words += 4 + clen_words

    allr = np.vstack([r[3] for r in recs]) if recs else np.zeros((1, 2))
    gx0, gy0 = allr.min(axis=0)
    gx1, gy1 = allr.max(axis=0)

    def header(total_words: int) -> bytes:
        h = struct.pack(">i", 9994) + b"\x00" * 20
        h += struct.pack(">i", total_words)
        h += struct.pack("<2i", 1000, 5)
        h += struct.pack("<4d", gx0, gy0, gx1, gy1)
        h += struct.pack("<4d", 0, 0, 0, 0)
        return h

    shp_body = b"".join(shp_records)
    base.with_suffix(".shp").write_bytes(header(50 + len(shp_body) // 2) + shp_body)
    shx_body = b"".join(shx_entries)
    base.with_suffix(".shx").write_bytes(header(50 + len(shx_body) // 2) + shx_body)

    # --- .dbf (dBASE III) ----------------------------------------------
    fields = [("TILENAME", 20), ("SUBGRID", 2), ("LAND", 1)]
    rec_size = 1 + sum(w for _, w in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack("<B3BI2H20x", 0x03, 26, 8, 16, len(recs), hdr_size, rec_size)
    for fname, width in fields:
        dbf += struct.pack("<11sc4xBB14x", fname.encode().ljust(11, b"\x00"), b"C", width, 0)
    dbf += b"\x0d"
    for name, subgrid, land, _ in recs:
        row = b" " + name.encode().ljust(20)[:20] + subgrid.encode().ljust(2)[:2]
        row += (b"T" if land else b"F")
        dbf += row
    dbf += b"\x1a"
    base.with_suffix(".dbf").write_bytes(bytes(dbf))
    base.with_suffix(".prj").write_text(_WGS84_PRJ)
