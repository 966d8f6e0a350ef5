"""Warp path goldens, mirroring the reference's synthetic fixtures
(reference tests/test_warp.py:43-262). Tile sets are reference goldens;
pixel content is checked by invariants (nodata preserved, class set
preserved for nearest, analytic-function agreement for bilinear) since
the reference's approved .tif blobs need rasterio to decode."""

import numpy as np
import pandas as pd
import pytest

from equi7grid_spark.constants import make_grid_config
from equi7grid_spark.warp.crs import crs_forward, crs_inverse
from equi7grid_spark.warp.resample import (
    overlapping_tiles,
    resample_to_equi7_tiles,
    warp_image_to_tile,
)


def lonlat_img_continuous():
    # reference tests/test_warp.py:43-80
    extent = (50.0, 60.7, 51.2, 63.2)
    sampling = 0.1
    nodata = -9999
    width = int((extent[2] - extent[0]) / sampling)
    height = int((extent[3] - extent[1]) / sampling)
    w_ar, h_ar = np.meshgrid(np.arange(width), np.arange(height))
    ar = (w_ar**2 + h_ar**2).astype(np.int16)
    ar[height // 2, width // 2] = nodata
    return ar, extent, nodata, "EPSG:4326"


def webmercator_img_discrete():
    # reference tests/test_warp.py:83-124
    extent = (4_900_000.0, 7_810_000.0, 6_180_000.0, 8_750_000.0)
    sampling = 10_000
    nodata = 255
    width = int((extent[2] - extent[0]) / sampling)
    height = int((extent[3] - extent[1]) / sampling)
    w_ar, h_ar = np.meshgrid(np.arange(width), np.arange(height))
    ar = w_ar**2 + h_ar**2
    out = np.zeros_like(ar)
    out[ar < (width + height)] = 0
    out[(ar >= (width + height)) & (ar < (width**2 + height))] = 1
    out[ar >= (width**2 + height)] = 2
    out = out.astype(np.uint8)
    out[height // 4, width // 4] = nodata
    return out, extent, nodata, "EPSG:3857"


def to_df(spark, arr, extent, nodata, crs, image_id):
    pdf = pd.DataFrame(
        [
            {
                "image_id": image_id,
                "bytes": arr.tobytes(),
                "fmt": "raw",
                "dtype": str(arr.dtype),
                "w": arr.shape[1],
                "h": arr.shape[0],
                "crs": crs,
                "x_min": extent[0],
                "y_min": extent[1],
                "x_max": extent[2],
                "y_max": extent[3],
                "nodata": float(nodata),
            }
        ]
    )
    return spark.createDataFrame(pdf)


def test_webmercator_roundtrip():
    lon = np.array([10.0, -75.3, 131.0])
    lat = np.array([50.0, -12.0, 66.6])
    x, y = crs_forward("EPSG:3857", lon, lat)
    lon2, lat2 = crs_inverse("EPSG:3857", x, y)
    np.testing.assert_allclose(lon, lon2, atol=1e-9)
    np.testing.assert_allclose(lat, lat2, atol=1e-9)
    # known anchor: lon 180 → x = pi*R
    x, _ = crs_forward(3857, 180.0, 0.0)
    np.testing.assert_allclose(float(x), np.pi * 6378137.0)


def test_overlapping_tiles_lonlat_continuous():
    # reference test_reprojecting_lonlat_continuous (:129-174): 4 tiles
    arr, extent, nodata, crs = lonlat_img_continuous()
    tiles = overlapping_tiles(
        crs, extent, "T6", arr=arr, nodata=nodata, accurate_boundary=True
    )
    assert sorted(t.tilename for t in tiles) == [
        "AS_E018N066T6",
        "AS_E018N072T6",
        "EU_E066N030T6",
        "EU_E072N030T6",
    ]


def test_overlapping_tiles_lonlat_eu_only():
    # reference test_reprojecting_lonlat_continuous_eu (:177-210): 2 tiles
    arr, extent, nodata, crs = lonlat_img_continuous()
    grid = make_grid_config({"T6": 1000}, continent_order=["EU"])
    tiles = overlapping_tiles(
        crs, extent, "T6", grid=grid, arr=arr, nodata=nodata, accurate_boundary=True
    )
    assert sorted(t.tilename for t in tiles) == ["EU_E066N030T6", "EU_E072N030T6"]


def test_overlapping_tiles_webmercator_eu():
    # reference test_reprojecting_webmercator_discrete_eu (:217-260): 4 tiles
    arr, extent, nodata, crs = webmercator_img_discrete()
    grid = make_grid_config({"T6": 10_000}, continent_order=["EU"])
    tiles = overlapping_tiles(
        crs, extent, "T6", grid=grid, arr=arr, nodata=nodata, accurate_boundary=True
    )
    assert sorted(t.tilename for t in tiles) == [
        "EU_E066N024T6",
        "EU_E066N030T6",
        "EU_E072N024T6",
        "EU_E072N030T6",
    ]


def test_warp_bilinear_matches_analytic():
    """Bilinear resampling of the smooth w^2+h^2 surface must agree with
    direct evaluation at the source coordinates of each target pixel."""
    arr, extent, nodata, crs = lonlat_img_continuous()
    out = warp_image_to_tile(
        arr, crs, extent, nodata, "EU", 6_600_000.0, 3_000_000.0, 600_000.0, 1000.0,
        "bilinear",
    )
    valid = out != nodata
    assert valid.sum() > 5_000
    # direct evaluation: source col/row (continuous) at each tile pixel
    from equi7grid_spark.geodesy import aeqd_inverse

    n = out.shape[0]
    c = np.arange(n) + 0.5
    x = 6_600_000.0 + c * 1000.0
    y = 3_600_000.0 - c * 1000.0
    X, Y = np.meshgrid(x, y)
    lon, lat = aeqd_inverse("EU", X.ravel(), Y.ravel())
    col_f = (lon - extent[0]) / 0.1 - 0.5
    row_f = (extent[3] - lat) / 0.1 - 0.5
    expected = col_f**2 + row_f**2
    got = out.ravel().astype(np.float64)
    m = (out.ravel() != nodata) & (col_f > 0) & (row_f > 0) & (col_f < 11) & (row_f < 24)
    err = np.abs(got[m] - expected[m])
    # bilinear of a quadratic ≈ the quadratic (plus int16 rounding);
    # pixels next to the injected nodata hole legitimately deviate more
    # because the nodata-aware kernel drops that corner.
    assert np.percentile(err, 99) <= 1.5
    assert err.max() <= 4.0


def test_resample_spark_end_to_end(spark):
    arr, extent, nodata, crs = lonlat_img_continuous()
    df = to_df(spark, arr, extent, nodata, crs, "lonlat_img_continuous")
    out = resample_to_equi7_tiles(df, "T6", 1000.0, resampling="bilinear")
    rows = out.collect()
    assert sorted(r.tilename for r in rows) == [
        "AS_E018N066T6",
        "AS_E018N072T6",
        "EU_E066N030T6",
        "EU_E072N030T6",
    ]
    for r in rows:
        assert (r.w, r.h) == (600, 600)
        a = np.frombuffer(r.bytes, dtype=np.dtype(r.dtype)).reshape(r.h, r.w)
        assert r.n_valid == int((a != r.nodata).sum())
        assert r.n_valid > 0
        vals = a[a != r.nodata]
        if vals.size:
            assert vals.min() >= 0
            assert vals.max() <= (12**2 + 25**2)


def test_resample_spark_nearest_discrete(spark):
    arr, extent, nodata, crs = webmercator_img_discrete()
    df = to_df(spark, arr, extent, nodata, crs, "webmercator_img_discrete")
    grid = make_grid_config({"T6": 10_000}, continent_order=["EU"])
    out = resample_to_equi7_tiles(df, "T6", 10_000.0, grid=grid, resampling="nearest")
    rows = out.collect()
    assert sorted(r.tilename for r in rows) == [
        "EU_E066N024T6",
        "EU_E066N030T6",
        "EU_E072N024T6",
        "EU_E072N030T6",
    ]
    seen = set()
    for r in rows:
        a = np.frombuffer(r.bytes, dtype=np.uint8).reshape(60, 60)
        seen.update(np.unique(a).tolist())
    # nearest must not invent values: classes {0,1,2} + nodata 255 only
    assert seen <= {0, 1, 2, 255}
    assert {0, 1, 2} <= seen


def test_warp_pixels_pinned_golden():
    """Engine-pinned golden (first verified run): checksum of one warped
    tile, guarding against silent kernel regressions."""
    arr, extent, nodata, crs = lonlat_img_continuous()
    out = warp_image_to_tile(
        arr, crs, extent, nodata, "EU", 6_600_000.0, 3_000_000.0, 600_000.0, 1000.0,
        "bilinear",
    )
    valid = out != nodata
    import hashlib

    digest = hashlib.sha1(out.tobytes()).hexdigest()
    # pinned by the first verified run (see test_warp_bilinear_matches_analytic)
    assert valid.sum() == 8298, valid.sum()
    assert digest == "0c6c4918da2fe56d554770b3c11b59e0ba6c4264", digest


def test_accurate_boundary_concave_L_matches_exact_region(monkeypatch):
    """VERDICT round-1 #7: a concave (L-shaped) footprint must select
    exactly the tiles intersecting the dilated valid region — a bbox of
    the valid mask would admit tiles in the empty concave corner."""
    from equi7grid_spark.warp.resample import (
        _coarse_valid_mask,
        _tile_intersects_mask,
    )
    from equi7grid_spark.warp.crs import crs_forward
    from equi7grid_spark.geodesy import aeqd_inverse

    nodata = -9999
    extent = (0.0, 40.0, 24.0, 60.0)  # 24 x 20 degrees
    w, h = 240, 200
    arr = np.full((h, w), nodata, dtype=np.int16)
    arr[h - 40 :, :] = 7      # bottom arm (lat 40..44)
    arr[:, :40] = 7           # left arm (lon 0..4)
    crs = "EPSG:4326"

    tiles = overlapping_tiles(crs, extent, "T6", arr=arr, nodata=nodata,
                              accurate_boundary=True)
    naive = overlapping_tiles(crs, extent, "T6", arr=arr, nodata=nodata,
                              accurate_boundary=False)
    got = {t.tilename for t in tiles}
    assert got < {t.tilename for t in naive}

    # independent oracle: dense 96x96 sampling of each candidate tile
    # footprint against the same dilated coarse mask
    mask, f = _coarse_valid_mask(arr, nodata)

    def sampled(t):
        c = (np.arange(96) + 0.5) * (t.tile_size / 96)
        X, Y = np.meshgrid(t.ll_x + c, t.ll_y + c)
        lon, lat = aeqd_inverse(t.subgrid, X.ravel(), Y.ravel())
        sx, sy = crs_forward(crs, lon, lat)
        ci = np.floor((sx - extent[0]) / ((extent[2] - extent[0]) / w * f)).astype(int)
        ri = np.floor((extent[3] - sy) / ((extent[3] - extent[1]) / h * f)).astype(int)
        inb = (ri >= 0) & (ri < mask.shape[0]) & (ci >= 0) & (ci < mask.shape[1])
        return bool(mask[ri[inb], ci[inb]].any()) if inb.any() else False

    expected = {t.tilename for t in naive if sampled(t)}
    assert got == expected
    # and the exact test itself agrees tile-by-tile on the candidates
    for t in naive:
        assert _tile_intersects_mask(t, mask, f, crs, extent, arr.shape) == (
            t.tilename in expected
        )


def test_accurate_boundary_region_inside_tile():
    """A tiny valid blob strictly inside one tile (footprint ring
    crosses no valid cell) must still select that tile — the
    region-inside-tile branch of the exact test."""
    nodata = -9999
    extent = (14.0, 47.0, 15.0, 48.0)
    arr = np.full((100, 100), nodata, dtype=np.int16)
    arr[50:52, 50:52] = 3
    tiles = overlapping_tiles("EPSG:4326", extent, "T6", arr=arr, nodata=nodata,
                              accurate_boundary=True)
    assert len(tiles) >= 1 and any(t.subgrid == "EU" for t in tiles)


def test_accurate_boundary_drops_nodata_tiles():
    """An L-shaped valid region must not select tiles covered only by
    nodata (reference accurate-boundary semantics, warp.py:79-156)."""
    arr, extent, nodata, crs = lonlat_img_continuous()
    # full-extent valid → 4 tiles (baseline)
    full = overlapping_tiles(crs, extent, "T6", arr=arr, nodata=nodata,
                             accurate_boundary=True)
    assert len(full) == 4
    # wipe the southern half (lat < 61.95 → bottom rows): only the
    # northern tiles survive
    arr2 = arr.copy()
    arr2[13:, :] = nodata  # rows 13..24 = south half (y_max at row 0)
    part = overlapping_tiles(crs, extent, "T6", arr=arr2, nodata=nodata,
                             accurate_boundary=True)
    assert set(t.tilename for t in part) < set(t.tilename for t in full)
    assert len(part) >= 2
    # without accurate_boundary the full bbox keeps all 4
    naive = overlapping_tiles(crs, extent, "T6", arr=arr2, nodata=nodata,
                              accurate_boundary=False)
    assert len(naive) == 4
