"""JVM fast-path parity: Column Vincenty + cell-map assignment must
reproduce the round-1 pandas/NumPy path exactly (same per-tile counts)
and the NumPy AEQD forward to sub-micrometer."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from equi7grid_spark.constants import DEFAULT_SYSTEM_ORDER
from equi7grid_spark.functions.geodesy_cols import with_aeqd_forward
from equi7grid_spark.geodesy import aeqd_forward
from equi7grid_spark.operators.assign import assign_tiles, tile_counts
from equi7grid_spark.operators.assign_jvm import (
    assign_tiles_jvm,
    cell_code_pdf,
    tile_counts_jvm,
)
from equi7grid_spark.zones import assign_primary_zone_code


def _inzone_grid(step=1.5):
    """Dense global grid with per-point primary zone, in-zone only."""
    lon = np.arange(-179.75, 180.0, step)
    lat = np.arange(-89.75, 90.0, step)
    LO, LA = np.meshgrid(lon, lat)
    lo, la = LO.ravel(), LA.ravel()
    zc = assign_primary_zone_code(lo, la)
    m = zc >= 0
    return lo[m], la[m], zc[m]


def test_column_vincenty_matches_numpy(spark):
    lo, la, zc = _inzone_grid(step=1.5)
    pdf = pd.DataFrame({"lon": lo, "lat": la, "zc": zc.astype("int8")})
    sdf = spark.createDataFrame(pdf)
    out = (
        with_aeqd_forward(sdf, "zc", "lon", "lat", "x", "y")
        .orderBy("lon", "lat")
        .toPandas()
    )
    ref = pdf.sort_values(["lon", "lat"]).reset_index(drop=True)
    xs = np.empty(len(ref))
    ys = np.empty(len(ref))
    for code in np.unique(ref["zc"]):
        m = (ref["zc"] == code).to_numpy()
        cc = DEFAULT_SYSTEM_ORDER[code]
        xs[m], ys[m] = aeqd_forward(cc, ref["lon"].to_numpy()[m], ref["lat"].to_numpy()[m])
    dx = np.abs(out["x"].to_numpy() - xs)
    dy = np.abs(out["y"].to_numpy() - ys)
    assert dx.max() < 1e-6 and dy.max() < 1e-6, (dx.max(), dy.max())


def test_column_inverse_matches_numpy_and_closes_roundtrip(spark):
    """Round-4 JVM-side inverse projection (with_aeqd_inverse): must
    agree with the converged NumPy direct kernel and close the
    forward-inverse roundtrip on a dense in-zone grid."""
    from equi7grid_spark.functions.geodesy_cols import with_aeqd_inverse
    from equi7grid_spark.geodesy import aeqd_inverse

    lo, la, zc = _inzone_grid(step=2.5)
    xs = np.empty(lo.size)
    ys = np.empty(lo.size)
    for code in np.unique(zc):
        m = zc == code
        xs[m], ys[m] = aeqd_forward(DEFAULT_SYSTEM_ORDER[code], lo[m], la[m])
    pdf = pd.DataFrame(
        {"zc": zc.astype("int8"), "x": xs, "y": ys, "lon0": lo, "lat0": la}
    )
    out = (
        with_aeqd_inverse(spark.createDataFrame(pdf))
        .orderBy("lon0", "lat0")
        .toPandas()
    )
    ref = pdf.sort_values(["lon0", "lat0"]).reset_index(drop=True)
    eln = np.empty(len(ref))
    elt = np.empty(len(ref))
    for code in np.unique(ref["zc"]):
        m = (ref["zc"] == code).to_numpy()
        eln[m], elt[m] = aeqd_inverse(
            DEFAULT_SYSTEM_ORDER[code],
            ref["x"].to_numpy()[m],
            ref["y"].to_numpy()[m],
        )
    dlon = np.abs(out["lon"].to_numpy() - eln)
    assert np.minimum(dlon, 360.0 - dlon).max() < 1e-9
    assert np.abs(out["lat"].to_numpy() - elt).max() < 1e-9
    rlon = np.abs(out["lon"].to_numpy() - ref["lon0"].to_numpy())
    assert np.minimum(rlon, 360.0 - rlon).max() < 1e-9
    assert np.abs(out["lat"].to_numpy() - ref["lat0"].to_numpy()).max() < 1e-9


def test_cell_map_decided_agrees_with_exact(spark):
    """Every decided cell's code must equal the exact kernel's answer
    for points sampled inside the cell (4 interior samples/cell)."""
    codes = cell_code_pdf()
    dec = codes[codes["zc"] >= 0]
    ix = (dec["cell_id"] // 180).to_numpy()
    iy = (dec["cell_id"] % 180).to_numpy()
    for fx, fy in [(0.25, 0.25), (0.75, 0.25), (0.25, 0.75), (0.75, 0.75)]:
        lo = ix - 180.0 + fx
        la = iy - 90.0 + fy
        exact = assign_primary_zone_code(lo, la)
        assert (exact == dec["zc"].to_numpy()).all()


def _points(spark, sf_dir):
    from equi7grid_spark.queries import _derived_lonlat

    return _derived_lonlat(spark, sf_dir)


@pytest.mark.parametrize("tiling_id", ["T6", "T3"])
def test_tile_counts_jvm_equals_pandas_path(spark, sf_dir, tiling_id):
    df = _points(spark, sf_dir).select("lon", "lat")
    a = tile_counts(df, tiling_id=tiling_id).orderBy("tilename").toPandas()
    b = tile_counts_jvm(df, tiling_id=tiling_id).orderBy("tilename").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_tile_counts_jvm_boundary_heavy(spark):
    """Grid that oversamples prefilter-boundary cells (the pandas
    fallback branch) — counts must still match the exact path."""
    codes = cell_code_pdf()
    und = codes[codes["zc"] == -2].head(400)
    ix = (und["cell_id"] // 180).to_numpy()
    iy = (und["cell_id"] % 180).to_numpy()
    pts = []
    for fx in (0.1, 0.5, 0.9):
        for fy in (0.1, 0.5, 0.9):
            pts.append(np.stack([ix - 180.0 + fx, iy - 90.0 + fy], axis=1))
    arr = np.concatenate(pts)
    pdf = pd.DataFrame({"lon": arr[:, 0], "lat": arr[:, 1]})
    sdf = spark.createDataFrame(pdf)
    a = tile_counts(sdf).orderBy("tilename").toPandas()
    b = tile_counts_jvm(sdf).orderBy("tilename").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_assign_tiles_jvm_equals_pandas_path(spark, sf_dir):
    df = _points(spark, sf_dir).withColumnRenamed("pt_id", "event_id")
    cols = ["event_id", "subgrid", "tilename", "x", "y"]
    a = (
        assign_tiles(df, sampling=500.0)
        .select(*cols, "row", "col")
        .orderBy("event_id")
        .toPandas()
    )
    b = (
        assign_tiles_jvm(df, sampling=500.0)
        .select(*cols, "row", "col")
        .orderBy("event_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        a[["event_id", "subgrid", "tilename", "row", "col"]],
        b[["event_id", "subgrid", "tilename", "row", "col"]],
    )
    np.testing.assert_allclose(a["x"], b["x"], atol=1e-6)
    np.testing.assert_allclose(a["y"], b["y"], atol=1e-6)


def test_tile_counts_column_fallback_equals_kernel(spark, sf_dir, monkeypatch):
    """Both execution paths — compiled kernel and pure Column
    Vincenty — must agree with the pandas path (and hence each other)."""
    from equi7grid_spark.operators import kernel

    df = _points(spark, sf_dir).select("lon", "lat")
    ref = tile_counts(df).orderBy("tilename").toPandas()
    with_kernel = tile_counts_jvm(df).orderBy("tilename").toPandas()
    monkeypatch.setattr(kernel, "kernel_available", lambda s: False)
    columns_only = tile_counts_jvm(df).orderBy("tilename").toPandas()
    pd.testing.assert_frame_equal(ref, with_kernel)
    pd.testing.assert_frame_equal(ref, columns_only)


def test_kernel_xy_matches_numpy(spark):
    from equi7grid_spark.operators import kernel

    if not kernel.kernel_available(spark):
        pytest.skip("kernel jar not available")
    lo, la, zc = _inzone_grid(step=3.5)
    pdf = pd.DataFrame({"lon": lo, "lat": la, "zc": zc.astype("int8")})
    out = (
        spark.createDataFrame(pdf)
        .select("zc", "lon", "lat", kernel.xy_col(F.col("zc"), F.col("lon"), F.col("lat")).alias("xy"))
        .toPandas()
    )
    xs = np.empty(len(out))
    ys = np.empty(len(out))
    for code in np.unique(out["zc"]):
        m = (out["zc"] == code).to_numpy()
        cc = DEFAULT_SYSTEM_ORDER[code]
        xs[m], ys[m] = aeqd_forward(cc, out["lon"].to_numpy()[m], out["lat"].to_numpy()[m])
    gx = np.array([v[0] for v in out["xy"]])
    gy = np.array([v[1] for v in out["xy"]])
    assert np.abs(gx - xs).max() < 1e-8 and np.abs(gy - ys).max() < 1e-8


def test_kernel_lonlat_matches_numpy(spark):
    """Compiled AEQD inverse (equi7_lonlat) vs the converged NumPy
    direct kernel, plus roundtrip closure on the original lonlat."""
    from equi7grid_spark.geodesy import aeqd_inverse
    from equi7grid_spark.operators import kernel

    if not kernel.kernel_available(spark):
        pytest.skip("kernel jar not available")
    lo, la, zc = _inzone_grid(step=3.5)
    xs = np.empty(lo.size)
    ys = np.empty(lo.size)
    for code in np.unique(zc):
        m = zc == code
        xs[m], ys[m] = aeqd_forward(DEFAULT_SYSTEM_ORDER[code], lo[m], la[m])
    pdf = pd.DataFrame(
        {"i": np.arange(lo.size), "zc": zc.astype("int8"), "x": xs, "y": ys}
    )
    out = (
        spark.createDataFrame(pdf)
        .select(
            "i", "zc", "x", "y",
            kernel.lonlat_col(F.col("zc"), F.col("x"), F.col("y")).alias("ll"),
        )
        .orderBy("i")
        .toPandas()
    )
    eln = np.empty(len(out))
    elt = np.empty(len(out))
    oz = out["zc"].to_numpy()
    for code in np.unique(oz):
        m = oz == code
        eln[m], elt[m] = aeqd_inverse(
            DEFAULT_SYSTEM_ORDER[code],
            out["x"].to_numpy()[m],
            out["y"].to_numpy()[m],
        )
    glon = np.array([v[0] for v in out["ll"]])
    glat = np.array([v[1] for v in out["ll"]])
    dlon = np.abs(glon - eln)
    assert np.minimum(dlon, 360.0 - dlon).max() < 1e-11
    assert np.abs(glat - elt).max() < 1e-11
    # roundtrip closure on the ORIGINAL lonlat (rows aligned via the
    # explicit index) — catches a convention drift shared by the Java
    # and NumPy direct kernels
    rl = np.abs(glon - lo)
    assert np.minimum(rl, 360.0 - rl).max() < 1e-9
    assert np.abs(glat - la).max() < 1e-9


def test_kernel_boundary_resolve_matches_numpy_every_cell(spark):
    """Round-4 insurance gate (verdict #5): the jar's baked-in zone
    resolver + Vincenty must agree with the NumPy path on zone AND T6
    tile assignment for seeded points in EVERY one of the 2,701
    prefilter-boundary cells — exactly the cells the decided-subset
    oracles used to skip."""
    from equi7grid_spark.operators import kernel
    from equi7grid_spark.zones_pip import boundary_cands, resolve_numpy

    if not kernel.kernel_available(spark):
        pytest.skip("kernel jar not available")
    cells = np.repeat(
        np.array([c["cell_id"] for c in boundary_cands()]), 4
    )
    rng = np.random.default_rng(31)
    lon = (cells // 180) - 180.0 + rng.random(cells.size)
    lat = (cells % 180) - 90.0 + rng.random(cells.size)
    pdf = pd.DataFrame({"i": np.arange(cells.size), "lon": lon, "lat": lat})
    out = (
        spark.createDataFrame(pdf)
        .select(
            "i",
            kernel.zone_tile_key_col(F.col("lon"), F.col("lat"), 600000.0).alias("k"),
        )
        .orderBy("i")
        .toPandas()
    )
    k = out["k"].to_numpy(dtype="float64")  # NaN where null (out of zone)
    got_zc = np.where(np.isnan(k), -1, np.floor_divide(k, 1 << 28)).astype("int64")
    exp_zc = resolve_numpy(lon, lat)
    np.testing.assert_array_equal(got_zc, exp_zc)
    # tile floors vs the NumPy Vincenty on the in-zone rows
    m = exp_zc >= 0
    ki = out["k"].to_numpy()[m].astype("int64")
    got_tx = ((ki >> 14) & 16383) - 8192
    got_ty = (ki & 16383) - 8192
    exp_tx = np.empty(m.sum(), dtype="int64")
    exp_ty = np.empty(m.sum(), dtype="int64")
    for code in np.unique(exp_zc[m]):
        mm = exp_zc[m] == code
        x, y = aeqd_forward(DEFAULT_SYSTEM_ORDER[code], lon[m][mm], lat[m][mm])
        exp_tx[mm] = np.floor(x / 600000.0).astype("int64")
        exp_ty[mm] = np.floor(y / 600000.0).astype("int64")
    np.testing.assert_array_equal(got_tx, exp_tx)
    np.testing.assert_array_equal(got_ty, exp_ty)


def test_assign_tiles_jvm_keeps_all_rows_when_not_dropping(spark):
    """The std zones partition the globe (decided_cell_codes has no -1
    cells), so drop_out_of_zone=False must simply preserve row count and
    agree with the pandas path on every subgrid."""
    pdf = pd.DataFrame(
        {"lon": [5.0, -140.0, 170.0, -30.0], "lat": [47.0, 0.0, -85.0, 65.0]}
    )
    sdf = spark.createDataFrame(pdf)
    a = assign_tiles(sdf, drop_out_of_zone=False).orderBy("lon").collect()
    b = assign_tiles_jvm(sdf, drop_out_of_zone=False).orderBy("lon").collect()
    assert len(b) == 4
    assert [r.subgrid for r in a] == [r.subgrid for r in b]
    assert [r.tilename for r in a] == [r.tilename for r in b]
