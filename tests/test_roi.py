"""ROI tile-search goldens (reference tests/test_equi7grid.py:255-402)."""

import numpy as np
import pytest

from equi7grid_spark.roi import (
    get_tiles_in_geog_bbox,
    get_tiles_in_geom,
    get_tiles_in_xy_bbox,
)


def names(tiles):
    return sorted(t.tilename for t in tiles)


def test_search_tiles_geog_bbox_land():
    # reference :255-270 — matches even with the synthetic land mask
    r = names(get_tiles_in_geog_bbox((0, 30, 10, 40), "T6", cover_land=True))
    assert r == sorted(
        [
            "EU_E036N006T6",
            "EU_E042N000T6",
            "EU_E042N006T6",
            "AF_E030N084T6",
            "AF_E030N090T6",
            "AF_E036N084T6",
            "AF_E036N090T6",
            "AF_E042N084T6",
            "AF_E042N090T6",
        ]
    )


def test_tiles_sorted():
    # reference :273-282 — exact output order
    r = [t.tilename for t in get_tiles_in_geog_bbox((16, 48, 18, 50), "T6")]
    assert r == ["EU_E048N012T6", "EU_E048N018T6", "EU_E054N012T6", "EU_E054N018T6"]


def test_global_bbox_all():
    # reference :293-298
    r = get_tiles_in_geog_bbox((-179.9, -89.9, 179.9, 89.9), "T6")
    assert len(r) == 1801


@pytest.mark.xfail(
    reason="land.parquet blob absent from reference checkout; synthetic mask "
    "is engine-defined (SURVEY.md §5)",
    strict=False,
)
def test_global_bbox_cover_land():
    # reference :285-290 (golden 864 with the reference land mask)
    r = get_tiles_in_geog_bbox((-179.9, -89.9, 179.9, 89.9), "T6", cover_land=True)
    assert len(r) == 864


def test_global_bbox_cover_land_engine_count():
    # engine-defined land golden (synthetic mask ∩ zone), pinned for regression
    r = get_tiles_in_geog_bbox((-179.9, -89.9, 179.9, 89.9), "T6", cover_land=True)
    assert len(r) == 652


def test_north_pole_large():
    # reference :301-309
    r = names(get_tiles_in_geog_bbox((-170, 88, 150.0, 90), "T6"))
    assert r == ["NA_E078N084T6", "NA_E078N090T6", "NA_E084N084T6", "NA_E084N090T6"]


def test_north_pole_small_antimeridian():
    # reference :312-315
    r = names(get_tiles_in_geog_bbox((150.0, 88, -170, 90), "T6"))
    assert r == ["NA_E078N090T6"]


def test_south_pole():
    # reference :318-321
    r = names(get_tiles_in_geog_bbox((-170, -90, 150.0, -89), "T6"))
    assert r == ["AN_E036N030T6"]


def test_antimeridian_bbox():
    # reference :324-337
    r = names(get_tiles_in_geog_bbox((179, 66, -150, 67.85), "T6"))
    assert r == sorted(
        [
            "AS_E066N090T6",
            "AS_E066N096T6",
            "AS_E072N090T6",
            "AS_E072N096T6",
            "NA_E054N072T6",
            "NA_E054N078T6",
            "NA_E060N072T6",
        ]
    )


SPITZBERGEN = np.array(
    [
        (8.391827331539572, 77.35762113396143),
        (25.43098663332705, 75.61353436967198),
        (40.50119498304080, 79.73786853853339),
        (16.87007957357446, 81.59290885863483),
    ]
)

SIBERIA_ALASKA = np.array(
    [
        (177.6545884597184, 67.05574774066811),
        (179.0195867605756, 65.33232820668778),
        (198.4723636216472 - 360, 66.06909015550372),
        (198.7828129097253 - 360, 68.14247939909886),
    ]
)


def test_spitzbergen_polygon():
    # reference :340-349
    r = names(get_tiles_in_geom(SPITZBERGEN, "T6"))
    assert r == ["EU_E054N042T6", "EU_E054N048T6", "EU_E060N042T6", "EU_E060N048T6"]


def test_siberia_alaska_antimeridian_polygon():
    # reference :352-368
    r = names(get_tiles_in_geom(SIBERIA_ALASKA, "T6", cover_land=False))
    assert r == sorted(
        [
            "AS_E066N090T6",
            "AS_E066N096T6",
            "AS_E072N090T6",
            "AS_E072N096T6",
            "NA_E054N072T6",
            "NA_E054N078T6",
            "NA_E060N078T6",
        ]
    )


def test_siberia_alaska_land():
    # passes exactly with land ∩ zone semantics (Alaska is NA-zone land,
    # so the AS N096 tiles covering it in AS projection are not 'land')
    # reference :371-385
    r = names(get_tiles_in_geom(SIBERIA_ALASKA, "T6", cover_land=True))
    assert r == sorted(
        [
            "AS_E066N090T6",
            "AS_E072N090T6",
            "NA_E054N072T6",
            "NA_E054N078T6",
            "NA_E060N078T6",
        ]
    )


def test_xy_bbox():
    # reference :388-402
    r = names(
        get_tiles_in_xy_bbox("EU", (5138743, 1111111, 6200015, 1534657), "T6")
    )
    assert r == sorted(
        [
            "EU_E048N006T6",
            "EU_E054N006T6",
            "EU_E060N006T6",
            "EU_E048N012T6",
            "EU_E054N012T6",
            "EU_E060N012T6",
        ]
    )
