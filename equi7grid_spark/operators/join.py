"""Spatial-join operators: image×tile-catalog joins and tile kNN.

The tile catalog (~65k rows, §catalog.py) is the small dimension side
of every join here — always broadcast, never shuffled. Joins run on
compact integer keys (zone code, tile indices); strings stay on the
catalog side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from equi7grid_spark.data_loader import data_path
from equi7grid_spark.constants import DEFAULT_SYSTEM_ORDER, TILING_ID_TO_SIZE


def catalog_df(
    spark: SparkSession, tiling_id: str | None = None, variant: str = "std"
) -> DataFrame:
    """The prepare-job tile catalog as a DataFrame with int join keys."""
    df = spark.read.parquet(data_path("tile_catalog.parquet"))
    df = df.filter(F.col("variant") == variant).drop("variant")
    if tiling_id:
        df = df.filter(F.col("tiling_id") == tiling_id)
        ts = float(TILING_ID_TO_SIZE[tiling_id])
        df = df.withColumn("tx", F.round(F.col("ll_x") / ts).cast("long")).withColumn(
            "ty", F.round(F.col("ll_y") / ts).cast("long")
        )
    return df


def join_tile_catalog(
    assigned: DataFrame,
    spark: SparkSession,
    tiling_id: str = "T6",
    *,
    how: str = "left",
) -> DataFrame:
    """Join tile-assigned rows (subgrid, tilename, ...) against the
    broadcast catalog, attaching covers_land / zone_boundary. An inner
    join doubles as the validity filter (reference TileOutOfZoneError
    semantics, core.py:204-206)."""
    cat = catalog_df(spark, tiling_id).select(
        F.col("subgrid").alias("_cat_subgrid"),
        F.col("tilename").alias("_cat_tilename"),
        "covers_land",
        "zone_boundary",
    )
    out = assigned.join(
        F.broadcast(cat),
        (assigned["subgrid"] == cat["_cat_subgrid"])
        & (assigned["tilename"] == cat["_cat_tilename"]),
        how,
    )
    return out.drop("_cat_subgrid", "_cat_tilename")


def tile_neighbors(
    spark: SparkSession, tiling_id: str = "T6", *, include_self: bool = False
) -> DataFrame:
    """Adjacent-tile pairs (8-neighborhood) within each subgrid — the
    regular-grid neighbor lookup implied by the reference's tile algebra
    (SURVEY.md §2.3). Broadcast self-join on integer tile indices."""
    cat = catalog_df(spark, tiling_id).select("subgrid", "tilename", "tx", "ty")
    a = cat.alias("a")
    b = cat.alias("b")
    cond = (
        (F.col("a.subgrid") == F.col("b.subgrid"))
        & (F.abs(F.col("a.tx") - F.col("b.tx")) <= 1)
        & (F.abs(F.col("a.ty") - F.col("b.ty")) <= 1)
    )
    if not include_self:
        cond = cond & (
            (F.col("a.tx") != F.col("b.tx")) | (F.col("a.ty") != F.col("b.ty"))
        )
    return a.join(F.broadcast(b), cond).select(
        F.col("a.subgrid").alias("subgrid"),
        F.col("a.tilename").alias("tilename"),
        F.col("b.tilename").alias("neighbor"),
        (F.col("b.tx") - F.col("a.tx")).cast("int").alias("dx"),
        (F.col("b.ty") - F.col("a.ty")).cast("int").alias("dy"),
    )


def knn_tiles(
    points: DataFrame,
    spark: SparkSession,
    tiling_id: str = "T6",
    k: int = 3,
    *,
    id_col: str = "pt_id",
    x_col: str = "x",
    y_col: str = "y",
    subgrid_col: str = "subgrid",
) -> DataFrame:
    """k nearest tiles (by center distance) for projected points: window
    top-k over a broadcast catalog join, pruned to a 3x3 tile
    neighborhood around each point so the join fan-out is 9 rows/point
    instead of |catalog| (SURVEY.md §2.3 kNN)."""
    ts = float(TILING_ID_TO_SIZE[tiling_id])
    cat = catalog_df(spark, tiling_id).select(
        F.col("subgrid").alias("_s"), "tilename", "tx", "ty"
    )
    pts = points.withColumn("_ptx", F.floor(F.col(x_col) / ts).cast("long")).withColumn(
        "_pty", F.floor(F.col(y_col) / ts).cast("long")
    )
    j = pts.join(
        F.broadcast(cat),
        (F.col(subgrid_col) == F.col("_s"))
        & (F.abs(F.col("tx") - F.col("_ptx")) <= 1)
        & (F.abs(F.col("ty") - F.col("_pty")) <= 1),
        "inner",
    )
    cx = (F.col("tx") + 0.5) * ts
    cy = (F.col("ty") + 0.5) * ts
    d2 = (F.col(x_col) - cx) * (F.col(x_col) - cx) + (F.col(y_col) - cy) * (F.col(y_col) - cy)
    w = Window.partitionBy(id_col).orderBy(d2.asc(), F.col("tilename").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("int").alias("rank"), "tilename")
    )
