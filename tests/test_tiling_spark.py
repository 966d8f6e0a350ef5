"""Tile-algebra Column goldens through Spark
(reference tests/test_equi7grid.py:120-252)."""

import pytest
from pyspark.sql import functions as F

from equi7grid_spark.catalog import catalog_name_set
from equi7grid_spark.functions import tiling as TL


def one_row(spark, **cols):
    return spark.createDataFrame([cols])


def test_rc2xy_goldens(spark):
    # tile from xy (3245631, 5146545) at T6 → EU_E030N048T6
    df = one_row(spark, x=3245631.0, y=5146545.0)
    df = df.withColumn("ll_x", TL.tile_ll(F.col("x"), 600000)).withColumn(
        "ll_y", TL.tile_ll(F.col("y"), 600000)
    )
    row = df.collect()[0]
    assert (row.ll_x, row.ll_y) == (3000000.0, 4800000.0)

    xg, yg = TL.rc2xy(F.lit(444), F.lit(333), F.col("ll_x"), F.col("ll_y"), 600000, 500, "ll")
    r = df.select(xg.alias("x"), yg.alias("y")).collect()[0]
    assert (r.x, r.y) == (3166500.0, 5177500.0)  # reference :120-126

    xg, yg = TL.rc2xy(F.lit(444), F.lit(333), F.col("ll_x"), F.col("ll_y"), 600000, 500, "c")
    r = df.select(xg.alias("x"), yg.alias("y")).collect()[0]
    assert (r.x, r.y) == (3166750.0, 5177750.0)  # reference :128-134

    # lower-left pixel of tile containing (4800123, 1200123): (n_rows-1, 0) → (x_min, y_min)
    df2 = one_row(spark, ll_x=4800000.0, ll_y=1200000.0)
    xg, yg = TL.rc2xy(F.lit(1199), F.lit(0), F.col("ll_x"), F.col("ll_y"), 600000, 500, "ll")
    r = df2.select(xg.alias("x"), yg.alias("y")).collect()[0]
    assert (r.x, r.y) == (4800000.0, 1200000.0)  # reference :136-142


def test_xy2rc_golden(spark):
    df = one_row(spark, ll_x=3000000.0, ll_y=4800000.0)
    rg, cg = TL.xy2rc(F.lit(3166500.0), F.lit(5178000.0), F.col("ll_x"), F.col("ll_y"), 600000, 500)
    r = df.select(rg.alias("r"), cg.alias("c")).collect()[0]
    assert (r.r, r.c) == (444, 333)  # reference :145-151


def test_tile_extents(spark):
    df = one_row(spark, ll_x=4800000.0, ll_y=1200000.0)
    x0, y0, x1, y1 = TL.tile_extent(F.col("ll_x"), F.col("ll_y"), 600000)
    r = df.select(x0.alias("a"), y0.alias("b"), x1.alias("c"), y1.alias("d")).collect()[0]
    assert (r.a, r.b, r.c, r.d) == (4800000.0, 1200000.0, 5400000.0, 1800000.0)
    x0, y0, x1, y1 = TL.coord_extent(F.col("ll_x"), F.col("ll_y"), 600000, 500)
    r = df.select(x0.alias("a"), y0.alias("b"), x1.alias("c"), y1.alias("d")).collect()[0]
    assert (r.a, r.b, r.c, r.d) == (4800000.0, 1200000.0, 5399500.0, 1799500.0)  # :154-161


def test_tilename_format_and_parse(spark):
    df = one_row(spark, sub="EU", ll_x=4200000.0, ll_y=600000.0)
    name = TL.tilename(F.col("sub"), F.col("ll_x"), F.col("ll_y"), "T6")
    assert df.select(name.alias("n")).collect()[0].n == "EU_E042N006T6"
    # negative y → S label (AS zone reaches y=-1.8e6)
    df = one_row(spark, sub="AS", ll_x=4200000.0, ll_y=-600000.0)
    name = TL.tilename(F.col("sub"), F.col("ll_x"), F.col("ll_y"), "T6")
    assert df.select(name.alias("n")).collect()[0].n == "AS_E042S006T6"

    parsed = (
        one_row(spark, n="AS_E042S006T6")
        .select(TL.parse_tilename(F.col("n")).alias("p"))
        .collect()[0]
        .p
    )
    assert parsed.subgrid == "AS"
    assert parsed.ll_x == 4200000.0
    assert parsed.ll_y == -600000.0
    assert parsed.tiling_id == "T6"
    assert parsed.valid


def test_invalid_tilename_modulus(spark):
    # reference :227-232 — EU_E011N023T6 has x%600000 != 0
    parsed = (
        one_row(spark, n="EU_E011N023T6")
        .select(TL.parse_tilename(F.col("n")).alias("p"))
        .collect()[0]
        .p
    )
    assert not parsed.valid


def test_tile_out_of_zone_catalog():
    # reference :220-224 — EU_E240N006T6 parses but is outside the EU zone
    assert "EU_E240N006T6" not in catalog_name_set("EU", "T6")
    assert "EU_E042N006T6" in catalog_name_set("EU", "T6")


def test_children_golden(spark):
    # reference :235-243 — EU_E042N006T6 → 4 T3 children
    df = one_row(spark, sub="EU", ll_x=4200000.0, ll_y=600000.0)
    ch = TL.children(F.col("ll_x"), F.col("ll_y"), "T6", "T3")
    out = (
        df.select(F.explode(ch).alias("c"), F.col("sub"))
        .select(TL.tilename(F.col("sub"), F.col("c.ll_x"), F.col("c.ll_y"), "T3").alias("n"))
        .collect()
    )
    assert sorted(r.n for r in out) == [
        "EU_E042N006T3",
        "EU_E042N009T3",
        "EU_E045N006T3",
        "EU_E045N009T3",
    ]


def test_parent_goldens(spark):
    # reference :245-252
    df = one_row(spark, sub="EU", ll_x=4100000.0, ll_y=1100000.0)  # EU_E041N011T1
    n = TL.tilename(
        F.col("sub"),
        TL.parent_ll(F.col("ll_x"), "T3"),
        TL.parent_ll(F.col("ll_y"), "T3"),
        "T3",
    )
    assert df.select(n.alias("n")).collect()[0].n == "EU_E039N009T3"

    # two-step T1 → T3 → T6: EU_E044N015T1 → EU_E042N012T6
    df = one_row(spark, sub="EU", ll_x=4400000.0, ll_y=1500000.0)
    n3x = TL.parent_ll(F.col("ll_x"), "T3")
    n3y = TL.parent_ll(F.col("ll_y"), "T3")
    n6 = TL.tilename(F.col("sub"), TL.parent_ll(n3x, "T6"), TL.parent_ll(n3y, "T6"), "T6")
    assert df.select(n6.alias("n")).collect()[0].n == "EU_E042N012T6"


def test_distortion_planar_column(spark):
    # reference :111-117
    df = one_row(spark, sub="AF", x=470916.85506916, y=8289708.44085851)
    k = TL.length_distortion_planar(F.col("sub"), F.col("x"), F.col("y"))
    got = df.select(k.alias("k")).collect()[0].k
    assert got == pytest.approx(1.1432971727108836, abs=1e-6)


def test_decode_tilename_properties(spark):
    # reference :214-218 — x_pixel_size & outer_boundary_corners[0]
    parsed = (
        one_row(spark, n="EU_E042N006T6")
        .select(TL.parse_tilename(F.col("n")).alias("p"))
        .select("p.*")
        .collect()[0]
    )
    assert (parsed.ll_x, parsed.ll_y) == (4200000.0, 600000.0)
    # sampling divides: 600000/500 = 1200 pixels
    assert 600000 % 500 == 0
