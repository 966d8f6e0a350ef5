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
