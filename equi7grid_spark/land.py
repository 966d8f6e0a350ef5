"""Synthetic global land mask (deterministic, in-repo).

The reference's ``land.parquet`` blob is absent from its checkout
(/root/reference/.MISSING_LARGE_BLOBS:2), so per SURVEY.md §5 the land
mask is pluggable data. This module ships a deterministic coarse
approximation of the continental outlines (fixed vertices, lon/lat
EPSG:4326) that exercises the same code path as the reference
(geographic land ∩ zone → densify → project → tile covers_land,
reference core.py:400-411 + core.py:60-77). `covers_land` counts are
therefore *engine-defined*; the reference's land-count goldens are
xfail (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np

# fmt: off
_LAND_POLYGONS: list[list[tuple[float, float]]] = [
    # Africa
    [(-17.0, 21.0), (-10.0, 31.0), (-6.0, 35.5), (3.0, 37.0), (11.0, 37.5),
     (20.0, 32.5), (32.0, 31.5), (34.0, 28.0), (37.0, 18.0), (43.0, 11.5),
     (51.0, 11.0), (40.5, -2.5), (35.0, -20.0), (30.0, -31.0), (19.0, -34.8),
     (14.0, -27.0), (12.0, -18.0), (9.0, -1.0), (8.5, 4.5), (-4.0, 5.2),
     (-8.0, 4.5), (-13.0, 9.0), (-17.0, 14.5)],
    # Eurasia mainland
    [(-9.5, 37.0), (-9.0, 43.5), (-2.0, 48.5), (-4.5, 48.5), (0.0, 51.0),
     (4.0, 53.0), (8.0, 57.0), (5.0, 62.0), (12.0, 65.0), (18.0, 69.5),
     (28.0, 71.0), (40.0, 67.5), (45.0, 68.5), (60.0, 69.5), (70.0, 72.5),
     (80.0, 73.0), (95.0, 76.0), (105.0, 77.5), (115.0, 73.5), (130.0, 71.5),
     (140.0, 72.5), (160.0, 70.0), (170.0, 69.8), (180.0, 65.5), (178.0, 64.5),
     (162.0, 61.0), (156.0, 51.0), (142.0, 54.0), (135.0, 44.0), (129.0, 40.0),
     (126.0, 35.0), (122.0, 30.0), (121.5, 23.5), (108.0, 18.0), (106.0, 9.0),
     (103.5, 1.3), (98.0, 8.0), (94.0, 16.0), (88.0, 21.5), (80.0, 9.0),
     (77.0, 8.0), (72.5, 19.0), (66.5, 25.0), (58.0, 25.5), (56.5, 27.0),
     (51.5, 27.5), (48.0, 30.0), (60.0, 41.0), (50.0, 45.0), (40.0, 47.0),
     (36.5, 45.0), (32.0, 45.0), (29.0, 41.0), (26.0, 40.0), (22.5, 36.5),
     (18.0, 40.0), (16.0, 38.0), (12.0, 44.0), (5.0, 43.2), (0.0, 39.5),
     (-2.0, 36.7)],
    # North America mainland
    [(-166.0, 68.5), (-156.0, 71.3), (-140.0, 70.0), (-128.0, 70.0),
     (-115.0, 73.5), (-95.0, 72.0), (-82.0, 73.0), (-75.0, 72.0),
     (-61.0, 58.0), (-65.0, 47.0), (-70.0, 41.5), (-75.0, 35.0),
     (-80.0, 32.0), (-80.0, 25.0), (-83.0, 29.0), (-90.0, 29.2),
     (-97.5, 25.9), (-97.0, 20.5), (-94.5, 18.2), (-88.0, 15.5),
     (-83.0, 8.5), (-80.0, 8.0), (-85.0, 11.5), (-95.0, 16.2),
     (-105.0, 20.0), (-110.0, 23.0), (-114.0, 31.5), (-120.0, 34.5),
     (-124.5, 40.0), (-125.0, 48.5), (-132.0, 55.0), (-150.0, 59.5),
     (-158.0, 56.0), (-165.0, 60.0), (-162.0, 64.5), (-168.3, 65.7)],
    # South America
    [(-77.5, 8.5), (-71.0, 12.0), (-62.0, 10.5), (-52.0, 5.0), (-44.0, -2.8),
     (-35.0, -9.0), (-39.0, -17.0), (-41.0, -22.5), (-48.5, -28.5),
     (-57.0, -34.5), (-62.0, -41.0), (-65.5, -47.0), (-68.5, -52.5),
     (-66.0, -55.0), (-74.0, -53.0), (-73.5, -46.0), (-73.0, -37.0),
     (-70.5, -25.0), (-75.5, -14.5), (-81.0, -6.0), (-80.5, 0.5)],
    # Australia
    [(113.5, -22.0), (114.0, -26.0), (115.5, -33.5), (124.0, -33.0),
     (131.5, -31.5), (137.5, -35.0), (139.5, -37.5), (146.0, -39.0),
     (150.0, -37.5), (153.5, -28.5), (146.5, -19.0), (142.5, -10.8),
     (136.5, -12.0), (130.5, -11.3), (122.0, -17.0)],
    # Antarctica (band to the pole)
    [(-180.0, -64.0), (180.0, -64.0), (180.0, -90.0), (-180.0, -90.0)],
    # Greenland
    [(-72.5, 78.5), (-58.0, 76.0), (-20.5, 83.5), (-12.0, 81.5),
     (-22.0, 70.0), (-43.0, 59.8), (-52.5, 65.0), (-54.5, 70.5),
     (-68.0, 76.0)],
    # Maritime Southeast Asia / New Guinea (coarse)
    [(95.0, 5.5), (104.0, -6.5), (114.0, -8.5), (125.0, -9.5), (132.0, -7.0),
     (141.0, -9.0), (150.5, -10.0), (147.0, -6.0), (141.0, -2.5),
     (131.0, -0.5), (120.0, 1.0), (109.0, 2.0)],
    # British Isles
    [(-10.5, 51.5), (-5.5, 50.0), (1.5, 51.2), (-1.5, 57.5), (-5.0, 58.5),
     (-8.0, 57.0)],
    # Iceland
    [(-24.5, 63.4), (-13.5, 63.4), (-13.0, 66.5), (-24.0, 66.5)],
    # Japan (coarse box chain)
    [(129.5, 31.0), (141.0, 35.5), (145.5, 44.0), (141.5, 45.5),
     (139.5, 42.0), (132.0, 35.0)],
    # Madagascar
    [(43.2, -16.0), (49.5, -12.0), (50.5, -16.0), (47.0, -25.0), (44.0, -25.3)],
    # New Zealand
    [(172.5, -34.5), (178.5, -37.5), (176.5, -41.0), (171.0, -42.5),
     (168.0, -46.5), (166.5, -45.5), (170.0, -41.0), (172.0, -40.5)],
]
# fmt: on


def load_land_polys() -> list[list[np.ndarray]]:
    """Land mask as polygon pieces (each: exterior ring + optional holes).

    Source resolution (pluggable, ADVICE round-1): if the environment
    variable ``EQUI7_LAND_GEOJSON`` points to a GeoJSON file of
    Polygon/MultiPolygon features (e.g. a Natural Earth land download),
    that data is used; otherwise the in-repo synthetic outline. Every
    ``covers_land`` / ``cover_land=True`` result is defined by whichever
    mask is active — with the synthetic default they are engine-defined
    and differ from the reference's (its land.parquet blob is absent
    upstream). Rebuild the tile catalog (scripts/prepare_data.py) after
    switching masks.
    """
    import json
    import os

    path = os.environ.get("EQUI7_LAND_GEOJSON")
    if path:
        gj = json.loads(open(path).read())
        feats = gj["features"] if gj.get("type") == "FeatureCollection" else [gj]
        polys: list[list[np.ndarray]] = []
        for f in feats:
            geom = f.get("geometry", f)
            if geom["type"] == "Polygon":
                coords = [geom["coordinates"]]
            elif geom["type"] == "MultiPolygon":
                coords = geom["coordinates"]
            else:
                continue
            for poly in coords:
                polys.append([np.asarray(ring, dtype=np.float64)[:, :2] for ring in poly])
        if not polys:
            raise ValueError(f"no Polygon/MultiPolygon features in {path}")
        return polys
    return [[np.array(p, dtype=np.float64)] for p in _LAND_POLYGONS]


def covers_land_sampled(
    cc: str,
    ix: np.ndarray,
    iy: np.ndarray,
    ts: float,
    k: int,
    variant: str = "std",
) -> np.ndarray:
    """Per tile (ix, iy at tile size ts): does any of a k x k sample of
    tile points lie inside both the land mask and zone `cc` in
    geographic space? (reference core.py:403-411 semantics: land is
    intersected with the *zone* before projection). Shared by the
    prepare-time catalog build and the runtime catalog fallback for
    user tilings."""
    from equi7grid_spark.geodesy import aeqd_inverse
    from equi7grid_spark.geom import points_in_polys
    from equi7grid_spark.zones import zone_membership

    n = ix.size
    if n == 0:
        return np.zeros(0, bool)
    offs = (np.arange(k) + 0.5) / k * ts
    OX, OY = np.meshgrid(offs, offs)
    px = (ix[:, None] * ts + OX.ravel()[None, :]).ravel()
    py = (iy[:, None] * ts + OY.ravel()[None, :]).ravel()
    lon, lat = aeqd_inverse(cc, px, py)
    in_land = points_in_polys(lon, lat, load_land_polys())
    hit = np.zeros(lon.shape, bool)
    if in_land.any():
        in_zone = zone_membership(
            lon[in_land], lat[in_land],
            buffered=(variant == "bfrd"), system_order=(cc,),
        )[:, 0]
        hit[in_land] = in_zone
    return hit.reshape(n, k * k).any(axis=1)
