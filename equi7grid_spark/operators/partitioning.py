"""Skew-aware partitioning helpers + the salted per-tile mosaic.

The north rule requires explicit skew handling for hot continental
zones: land-biased data concentrates in few tiles, so any per-tile
grouped-map (mosaicking, per-tile statistics, warp post-processing)
must not serialize a hot tile into one task. The pattern here is
two-stage salting: `salt = pmod(hash(id), n_salt)` subdivides each
tile group for the expensive stage; a cheap merge unsalts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_col: str, n_salt: int = 8) -> DataFrame:
    """Deterministic salt column from a row id."""
    return df.withColumn("salt", F.pmod(F.hash(F.col(id_col)), F.lit(n_salt)))


def spread_small_input(df: DataFrame) -> DataFrame:
    """Pre-explosion/pre-HOF parallelism guard: a small parquet file
    reads as ONE partition (row groups don't split), so an expensive
    operator downstream (a ~50x shingle explode, interpreted HOF dot
    products) runs single-core — measured 2.8s single-task for the
    sf0.1 shingle explosion vs 0.35s spread. Repartition only when the
    input has fewer partitions than cores; at real scale inputs
    already carry many partitions and this is a no-op (no shuffle
    added)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_repartition(
    df: DataFrame, keys: list[str], id_col: str, n_salt: int = 8
) -> DataFrame:
    """Repartition on (keys..., salt) so hot key groups spread over
    `n_salt` tasks. Callers running grouped maps must merge per-key
    afterwards (see mosaic_tiles)."""
    out = with_salt(df, id_col, n_salt)
    return out.repartition(*[F.col(k) for k in keys], F.col("salt"))


def _composite(arrays: list[np.ndarray], nodata: float, reducer: str) -> np.ndarray:
    acc = arrays[0].astype(np.float64)
    acc_mask = acc != nodata
    for a in arrays[1:]:
        a = a.astype(np.float64)
        m = a != nodata
        if reducer == "max":
            both = acc_mask & m
            acc[both] = np.maximum(acc[both], a[both])
        elif reducer == "last":
            acc[m] = a[m]
        elif reducer == "first":
            m = m & ~acc_mask
            acc[m] = a[m]
        else:
            raise ValueError(f"unknown reducer {reducer!r}")
        only_new = m & ~acc_mask
        acc[only_new] = a[only_new]
        acc_mask |= m
    acc[~acc_mask] = nodata
    return acc


def mosaic_tiles(
    warped: DataFrame, *, reducer: str = "max", n_salt: int = 8
) -> DataFrame:
    """Merge per-(tile, image) warped rasters into one raster per tile —
    the natural downstream of warp/resample.py at scale.

    'max' (associative + commutative) runs the two-stage salted
    grouped-map: stage 1 composites each (tile, salt) subgroup in
    parallel (hot tiles → n_salt tasks), stage 2 merges the ≤ n_salt
    partials per tile — exact for any interleaving.

    'first'/'last' are ORDER-dependent (by image_id): a salted split
    interleaves image ids across partials, so no partial ordering can
    make the two-stage merge exact (ADVICE round-1). They run as a
    single deterministic grouped-map per tile, sorted by image_id —
    correct, at the cost of one task per hot tile.
    """
    schema = (
        "subgrid string, tilename string, bytes binary, w int, h int, "
        "dtype string, nodata double, n_images long"
    )

    def stage(keys_have_salt: bool):
        def go(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("image_id" if "image_id" in pdf else "n_images")
            pdf = pdf.reset_index(drop=True)
            arrays = [
                np.frombuffer(b, dtype=np.dtype(dt)).reshape(h, w)
                for b, dt, w, h in zip(pdf["bytes"], pdf["dtype"], pdf["w"], pdf["h"])
            ]
            nodata = float(pdf["nodata"].iloc[0])
            out = _composite(arrays, nodata, reducer)
            dtype = np.dtype(pdf["dtype"].iloc[0])
            n_img = int(pdf["n_images"].sum()) if "n_images" in pdf else len(pdf)
            return pd.DataFrame([
                {
                    "subgrid": pdf["subgrid"].iloc[0],
                    "tilename": pdf["tilename"].iloc[0],
                    "bytes": out.astype(dtype).tobytes(),
                    "w": int(pdf["w"].iloc[0]),
                    "h": int(pdf["h"].iloc[0]),
                    "dtype": str(dtype),
                    "nodata": nodata,
                    "n_images": n_img,
                }
            ])

        return go

    if reducer in ("first", "last"):
        return warped.groupBy("subgrid", "tilename").applyInPandas(
            stage(False), schema=schema
        )
    salted = with_salt(warped, "image_id", n_salt)
    partial = salted.groupBy("subgrid", "tilename", "salt").applyInPandas(
        stage(True), schema=schema
    )
    return partial.groupBy("subgrid", "tilename").applyInPandas(stage(False), schema=schema)
