"""Object-level API parity: the reference's test_equi7grid.py scenarios
run against the engine's Equi7Grid facade (equi7grid_spark/api.py)."""

import numpy.testing as nptest
import pytest

from equi7grid_spark.api import (
    GeomOutOfZoneError,
    TileOutOfZoneError,
    get_standard_equi7grid,
)


@pytest.fixture(scope="module")
def e7grid():
    return get_standard_equi7grid(500)


def test_xy_to_lonlat(e7grid):
    lon, lat = e7grid.EU.xy_to_lonlat(5138743.127891, 1307029.157093)
    nptest.assert_allclose(15.1, lon)
    nptest.assert_allclose(45.3, lat)


def test_systems_and_forward(e7grid):
    assert e7grid.get_systems_from_lonlat(15.1, 45.3) == ["EU"]
    x, y = e7grid.EU.lonlat_to_xy(15.1, 45.3)
    nptest.assert_allclose(5138743.127891, x)
    nptest.assert_allclose(1307029.157093, y)


def test_antimeridian_routing(e7grid):
    for lon, lat, cc, xs, ys in [
        (-178.5, 67.75, "AS", 7048122.707876, 9238361.594967),
        (-178.0, 51.75, "NA", 3887311.532849, 7756934.345841),
        (173.0, 53.0, "NA", 3865149.386282, 8432250.89933),
    ]:
        assert e7grid.get_systems_from_lonlat(lon, lat) == [cc]
        x, y = e7grid.system(cc).lonlat_to_xy(lon, lat)
        nptest.assert_allclose(xs, x)
        nptest.assert_allclose(ys, y)


def test_distortions(e7grid):
    k = e7grid.AF.calc_length_distortion(470916.85506916, 8289708.44085851)
    nptest.assert_almost_equal(float(k), 1.1432971727108836, decimal=6)
    k = e7grid.calc_length_distortion_on_ellipsoid(-29.1, 24.0)
    nptest.assert_almost_equal(k, 1.1432971727108836, decimal=6)


def test_tile_pixel_transforms(e7grid):
    tile = e7grid.EU.get_tile_from_xy(3245631, 5146545, tiling_id="T6")
    assert tile.rc2xy(444, 333) == (3166500.0, 5177500.0)
    assert tile.rc2xy(444, 333, px_origin="c") == (3166750.0, 5177750.0)
    tile = e7grid.EU.get_tile_from_xy(4800123, 1200123, tiling_id="T6")
    assert tile.rc2xy(tile.n_rows - 1, 0, px_origin="ll") == (4800000.0, 1200000.0)
    tile = e7grid.EU.get_tile_from_xy(3245631, 5146545)
    assert tile.xy2rc(3166500, 5178000) == (444, 333)


def test_tile_extents_api(e7grid):
    t = e7grid.get_tile_from_name("EU_E048N012T6")
    assert t.outer_boundary_extent == (4800000.0, 1200000.0, 5400000.0, 1800000.0)
    assert t.coord_extent == (4800000.0, 1200000.0, 5399500.0, 1799500.0)
    assert t.geotrans == (4800000.0, 500.0, 0.0, 1800000.0, 0.0, -500.0)
    assert t.shape == (1200, 1200)
    assert t.x_coords[0] == 4800000.0 and t.y_coords[-1] == 1200000.0
    assert t.boundary_wkt.startswith("POLYGON ((4800000 1200000")


def test_lonlat2rc_in_tile(e7grid):
    tile = e7grid.EU.get_tile_from_lonlat(18.507, 44.571, tiling_id="T6")
    x, y = e7grid.EU.lonlat_to_xy(18.507, 44.571)
    assert tile.name == "EU_E048N012T6"
    assert tile.xy2rc(x, y) == (1199, 1199)


def test_decode_tilename_api(e7grid):
    t = e7grid.get_tile_from_name("EU_E042N006T6")
    assert t.x_pixel_size == 500
    assert t.outer_boundary_corners[0] == (4200000.0, 600000.0)
    with pytest.raises(TileOutOfZoneError):
        e7grid.get_tile_from_name("EU_E240N006T6")
    with pytest.raises(ValueError):
        e7grid.get_tile_from_name("EU_E011N023T6")


def test_children_parent_api(e7grid):
    ch = e7grid.EU.get_children_from_name("EU_E042N006T6")
    assert sorted(t.name for t in ch) == [
        "EU_E042N006T3", "EU_E042N009T3", "EU_E045N006T3", "EU_E045N009T3",
    ]
    assert e7grid.EU.get_parent_from_name("EU_E041N011T1").name == "EU_E039N009T3"
    p = e7grid.EU.get_parent_from_name("EU_E044N015T1")
    assert e7grid.EU.get_parent_from_name(p.name).name == "EU_E042N012T6"


def test_search_dispatcher(e7grid):
    tiles = e7grid.search_tiles(geog_bbox=(16, 48, 18, 50), tiling_id="T6")
    assert [t.name for t in tiles] == [
        "EU_E048N012T6", "EU_E048N018T6", "EU_E054N012T6", "EU_E054N018T6",
    ]
    tiles = e7grid.search_tiles(
        xy_bbox=(5138743, 1111111, 6200015, 1534657), subgrid="EU", tiling_id="T6"
    )
    assert len(tiles) == 6
    with pytest.raises(ValueError):
        e7grid.search_tiles()
    with pytest.raises(ValueError):
        e7grid.search_tiles(geog_bbox=(0, 0, 1, 1), xy_bbox=(0, 0, 1, 1))


def test_ftilenames_to_tiles(e7grid):
    ts = e7grid.ftilenames_to_tiles(["EU_E042N006T6", "EU_E048N012T6"])
    assert [t.name for t in ts] == ["EU_E042N006T6", "EU_E048N012T6"]
    with pytest.raises(TileOutOfZoneError):
        e7grid.ftilenames_to_tiles(["EU_E240N006T6"])


def test_system_order_grids():
    eu_only = get_standard_equi7grid(500, continent_order=["EU"])
    with pytest.raises(GeomOutOfZoneError):
        eu_only.lonlat_to_xy(51.12, 61.71)
    bfrd = get_standard_equi7grid(500, buffered=True)
    coords = bfrd.lonlat_to_xy(51.12, 61.71)
    assert list(coords.keys()) == ["AS", "EU"]
    bfrd_eu_first = get_standard_equi7grid(500, buffered=True, continent_order=["EU", "AS"])
    assert list(bfrd_eu_first.lonlat_to_xy(51.12, 61.71).keys()) == ["EU", "AS"]


def test_global_search_api(e7grid):
    tiles = e7grid.get_tiles_in_geog_bbox((-179.9, -89.9, 179.9, 89.9), "T6")
    assert len(tiles) == 1801
    assert all(t.in_zone for t in tiles[:50])


def test_tile_topology(e7grid):
    t = e7grid.get_tile_from_name("EU_E048N012T6")
    assert t.contains_xy(5000000, 1500000)
    assert t.intersects_extent((5399999, 1799999, 6000000, 2000000))
    assert not t.intersects_extent((5400001, 1800001, 6000000, 2000000))
    assert t.touches_extent((5400000, 1200000, 6000000, 1800000))
    assert t.within_extent((4000000, 1000000, 6000000, 2000000))
    assert t.covers_land  # central Europe

def test_grid_def_methods(e7grid, tmp_path):
    # docs/guides/grid.ipynb export cells: to_grid_def / to_file round trip
    from equi7grid_spark.api import Equi7Grid

    d = e7grid.to_grid_def()
    assert d["kind"] == "equi7grid_spark"
    g2 = Equi7Grid.from_grid_def(d)
    assert g2.config == e7grid.config
    p = tmp_path / "grid.json"
    e7grid.to_file(p)
    assert Equi7Grid.from_file(p).config == e7grid.config


def test_tile_overlaps_predicate(e7grid):
    t = e7grid.get_tile_from_name("EU_E048N012T6")
    # partial overlap
    assert t.overlaps_extent((5100000, 1500000, 6000000, 2000000))
    # containment is not 'overlaps'
    assert not t.overlaps_extent((4000000, 1000000, 6000000, 2000000))
    assert not t.overlaps_extent((4900000, 1300000, 5000000, 1400000))
    # touching is not 'overlaps'
    assert not t.overlaps_extent((5400000, 1200000, 6000000, 1800000))


def test_tiles_to_ogc_json(e7grid):
    from equi7grid_spark.export import tiles_to_ogc_json

    tiles = e7grid.get_tiles_in_geog_bbox((16, 48, 18, 50), "T6")
    fc = tiles_to_ogc_json(tiles)
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 4
    f0 = fc["features"][0]
    assert f0["properties"]["tilename"].startswith("EU_")
    lon0, lat0 = f0["geometry"]["coordinates"][0][0]
    assert -30 < lon0 < 60 and 35 < lat0 < 60
