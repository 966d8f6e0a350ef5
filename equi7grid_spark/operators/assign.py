"""Zone assignment + projection operators (vectorized pandas/Arrow UDFs).

The engine's hot path: for every (lon, lat) row decide its continental
zone (point-in-polygon against the broadcast zone index, reference
get_systems_from_lonlat core.py:436) and project to that zone's AEQD
meters (reference lonlat_to_xy, tests/test_equi7grid.py:59-99) — one
Arrow pass, no per-row Python. Tile ids then derive as pure Columns
(functions/tiling.py), keeping everything downstream inside
whole-stage codegen.

Scale design (10^12 rows): the zone index is a ~2 MB process-cached
NumPy structure (1° prefilter grid + ring arrays), loaded once per
executor; >99% of points resolve with one gather, only boundary-cell
points run exact PIP. Inside each Arrow batch, points are grouped by
zone so the Vincenty kernel runs on dense per-zone arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from equi7grid_spark.constants import (
    DEFAULT_SYSTEM_ORDER,
    TILING_ID_TO_SIZE,
)
from equi7grid_spark.functions.tiling import tile_ll, tilename, xy2rc
from equi7grid_spark.geodesy import (
    aeqd_forward,
    aeqd_inverse,
    length_distortion_ellipsoid,
)
from equi7grid_spark.zones import assign_primary_zone, zone_membership

_ZONE_XY_SCHEMA = T.StructType(
    [
        T.StructField("subgrid", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]
)


def _project_by_zone(subgrid: np.ndarray, lon: np.ndarray, lat: np.ndarray):
    """Dense per-zone Vincenty: group rows by zone, project each group."""
    x = np.full(lon.shape, np.nan)
    y = np.full(lon.shape, np.nan)
    for cc in np.unique(subgrid):
        if cc == "" or cc is None:
            continue
        m = subgrid == cc
        xs, ys = aeqd_forward(str(cc), lon[m], lat[m])
        x[m] = xs
        y[m] = ys
    return x, y


def zone_xy_udf(buffered: bool = False, system_order=DEFAULT_SYSTEM_ORDER):
    """pandas UDF: (lon, lat) → struct(subgrid, x, y) for the primary
    (first-in-order) zone. Null subgrid = outside every zone
    (reference GeomOutOfZoneError, tests/test_equi7grid.py:421-428)."""

    @F.pandas_udf(_ZONE_XY_SCHEMA)
    def _udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        sub = assign_primary_zone(lo, la, buffered=buffered, system_order=tuple(system_order))
        x, y = _project_by_zone(sub, lo, la)
        subgrid = pd.Series(sub).replace("", None)
        return pd.DataFrame({"subgrid": subgrid, "x": x, "y": y})

    return _udf


def zones_all_udf(buffered: bool = True, system_order=DEFAULT_SYSTEM_ORDER):
    """pandas UDF: (lon, lat) → array<string> of all containing zones in
    system_order (buffered zones overlap → up to 2,
    reference tests/test_equi7grid.py:412-418)."""
    order = tuple(system_order)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        member = zone_membership(lo, la, buffered=buffered, system_order=order)
        codes = np.array(order, dtype=object)
        return pd.Series([list(codes[m]) for m in member])

    return _udf


@F.pandas_udf(T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]))
def project_xy_udf(subgrid: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    """pandas UDF: AEQD forward for an explicit subgrid column."""
    sub = subgrid.to_numpy(dtype=object)
    x, y = _project_by_zone(sub, lon.to_numpy(np.float64), lat.to_numpy(np.float64))
    return pd.DataFrame({"x": x, "y": y})


@F.pandas_udf(T.StructType([T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]))
def inverse_lonlat_udf(subgrid: pd.Series, x: pd.Series, y: pd.Series) -> pd.DataFrame:
    """pandas UDF: AEQD inverse (xy_to_lonlat, tests/test_equi7grid.py:50-56)."""
    sub = subgrid.to_numpy(dtype=object)
    xs = x.to_numpy(np.float64)
    ys = y.to_numpy(np.float64)
    lon = np.full(xs.shape, np.nan)
    lat = np.full(xs.shape, np.nan)
    for cc in np.unique(sub):
        if cc == "" or cc is None:
            continue
        m = sub == cc
        lo, la = aeqd_inverse(str(cc), xs[m], ys[m])
        lon[m] = lo
        lat[m] = la
    return pd.DataFrame({"lon": lon, "lat": lat})


@F.pandas_udf(T.DoubleType())
def distortion_ellipsoid_udf(subgrid: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
    """pandas UDF: geodesic length distortion (reference core.py:416-452)."""
    sub = subgrid.to_numpy(dtype=object)
    lo = lon.to_numpy(np.float64)
    la = lat.to_numpy(np.float64)
    k = np.full(lo.shape, np.nan)
    for cc in np.unique(sub):
        if cc == "" or cc is None:
            continue
        m = sub == cc
        k[m] = length_distortion_ellipsoid(str(cc), lo[m], la[m])
    return pd.Series(k)


def assign_tiles(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    tiling_id: str = "T6",
    sampling: float | None = None,
    *,
    buffered: bool = False,
    system_order=DEFAULT_SYSTEM_ORDER,
    drop_out_of_zone: bool = True,
) -> DataFrame:
    """The flagship operator: zone assign + AEQD project + tile id.

    Adds columns: subgrid, x, y, ll_x, ll_y, tilename (+ row, col when
    `sampling` is given). With ``buffered=True`` points in overlap areas
    produce one output row per containing zone (reference lonlat_to_xy
    returning a per-continent dict, tests/test_equi7grid.py:412-418).

    Projection is one Arrow pass; tile math is pure Columns.
    """
    ts = float(TILING_ID_TO_SIZE[tiling_id])
    if buffered:
        zs = zones_all_udf(buffered=True, system_order=system_order)
        df = df.withColumn("subgrid", F.explode(zs(F.col(lon_col), F.col(lat_col))))
        df = df.withColumn("_xy", project_xy_udf(F.col("subgrid"), F.col(lon_col), F.col(lat_col)))
        df = df.withColumn("x", F.col("_xy.x")).withColumn("y", F.col("_xy.y")).drop("_xy")
    else:
        # asNondeterministic stops Catalyst from duplicating the (pure but
        # expensive) kernel when a later filter references a struct field —
        # without it the plan evaluates ArrowEvalPython twice.
        zxy = zone_xy_udf(buffered=False, system_order=system_order).asNondeterministic()
        df = df.withColumn("_z", zxy(F.col(lon_col), F.col(lat_col)))
        df = (
            df.withColumn("subgrid", F.col("_z.subgrid"))
            .withColumn("x", F.col("_z.x"))
            .withColumn("y", F.col("_z.y"))
            .drop("_z")
        )
        if drop_out_of_zone:
            df = df.filter(F.col("subgrid").isNotNull())
    df = df.withColumn("ll_x", tile_ll(F.col("x"), ts)).withColumn("ll_y", tile_ll(F.col("y"), ts))
    df = df.withColumn("tilename", tilename(F.col("subgrid"), F.col("ll_x"), F.col("ll_y"), tiling_id))
    if sampling is not None:
        r, c = xy2rc(F.col("x"), F.col("y"), F.col("ll_x"), F.col("ll_y"), ts, sampling)
        df = df.withColumn("row", r).withColumn("col", c)
    return df
