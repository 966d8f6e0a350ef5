"""Deterministic synthetic images table (FIXTURES.md §1).

Schema = BASELINE.json input_hint: (image_id:string, bytes:binary,
w:int32, h:int32, fmt:string, caption:string, phash:int64) plus the
fixture's lon/lat geolocation columns. Pure function of (seed, row
index) — any scale reproduces bit-identically; generated *distributed*
via spark.range → mapInPandas (modeled on the reference's practice of
synthesizing test rasters in fixtures, reference tests/test_warp.py:43-124).

The lon/lat mixture is land-biased around 12 continental anchor boxes
(3 EU, 2 AS, 2 NA, 2 AF, 1 SA, 1 OC, 1 AN) — this creates the hot-zone
skew the north rule requires the engine to handle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from equi7grid_spark.warp.codecs import encode

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lon double, lat double"
)

# (lon_min, lat_min, lon_max, lat_max) anchor boxes; weights equal.
ANCHORS = [
    (-5.0, 40.0, 15.0, 52.0),    # EU west
    (15.0, 45.0, 30.0, 55.0),    # EU central
    (20.0, 55.0, 35.0, 65.0),    # EU east
    (70.0, 20.0, 90.0, 35.0),    # AS south
    (100.0, 25.0, 120.0, 45.0),  # AS east
    (-120.0, 30.0, -90.0, 45.0), # NA west
    (-90.0, 35.0, -70.0, 48.0),  # NA east
    (-10.0, 5.0, 30.0, 25.0),    # AF north
    (15.0, -30.0, 35.0, -5.0),   # AF south
    (-70.0, -35.0, -45.0, -5.0), # SA
    (120.0, -35.0, 150.0, -15.0),# OC
    (-60.0, -78.0, 60.0, -70.0), # AN
]
P_ANCHOR = 0.85
FMTS = ["raw", "png", "q8"]


def _splitmix64(seed: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (seed + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _u01(h: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) from a hash + salt."""
    with np.errstate(over="ignore"):
        return (_splitmix64(h + np.uint64(salt)) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def make_batch(idx: np.ndarray, seed: int = 42, with_bytes: bool = True) -> pd.DataFrame:
    i = idx.astype(np.uint64)
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFF_FFFF_FFFF_FFFF)
    with np.errstate(over="ignore"):
        h = _splitmix64(seed_mix + i)

    w = (16 + ((h >> np.uint64(8)) % np.uint64(49))).astype(np.int32)
    hh = (16 + ((h >> np.uint64(16)) % np.uint64(49))).astype(np.int32)
    phash = (h & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
    fmt = np.array(FMTS, dtype=object)[(idx % 3).astype(np.int64)]

    # land-biased location mixture
    u_sel = _u01(h, 1)
    u_box = (_splitmix64(h + np.uint64(2)) % np.uint64(len(ANCHORS))).astype(np.int64)
    u_lon = _u01(h, 3)
    u_lat = _u01(h, 4)
    boxes = np.asarray(ANCHORS, dtype=np.float64)
    bx = boxes[u_box]
    lon_anchor = bx[:, 0] + u_lon * (bx[:, 2] - bx[:, 0])
    lat_anchor = bx[:, 1] + u_lat * (bx[:, 3] - bx[:, 1])
    lon_gl = u_lon * 360.0 - 180.0
    lat_gl = np.degrees(np.arcsin(u_lat * 2.0 - 1.0))
    anchored = u_sel < P_ANCHOR
    lon = np.where(anchored, lon_anchor, lon_gl)
    lat = np.where(anchored, lat_anchor, lat_gl)

    image_id = np.array([f"img{int(k):012d}" for k in idx], dtype=object)
    caption = np.array(
        [
            f"synthetic image {int(k)} at ({lo:.4f},{la:.4f})"
            for k, lo, la in zip(idx, lon, lat)
        ],
        dtype=object,
    )

    if with_bytes:
        data = []
        for k in range(len(idx)):
            r = np.arange(int(hh[k]), dtype=np.int64)[:, None]
            c = np.arange(int(w[k]), dtype=np.int64)[None, :]
            arr = ((r * 31 + c * 17 + int(idx[k])) % 251).astype(np.uint8)
            data.append(encode(arr, str(fmt[k])))
        blob = pd.Series(data, dtype=object)
    else:
        blob = pd.Series([b""] * len(idx), dtype=object)

    return pd.DataFrame(
        {
            "image_id": image_id,
            "bytes": blob,
            "w": w,
            "h": hh,
            "fmt": fmt,
            "caption": caption,
            "phash": phash,
            "lon": lon,
            "lat": lat,
        }
    )


def synthetic_images(
    spark: SparkSession,
    n: int,
    *,
    seed: int = 42,
    with_bytes: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic images table of `n` rows."""
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield make_batch(pdf["id"].to_numpy(), seed=seed, with_bytes=with_bytes)

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=SCHEMA)


# -- deterministic embedding synthesis (fixture for the embedding
# dedup signal; SQL twin in functions/images_sql.embedding_from_key_sql)

_EMB_UDFS: dict = {}


def embedding_from_key(col, dim: int = 16, salt: int = 1000):
    """array<double> Column: a deterministic dim-vector derived from a
    non-negative BIGINT key — v[d] = u01(splitmix64(key + salt + d))
    * 2 - 1. Rows sharing a key share an embedding bit-for-bit (the
    planted 'embed' near-dup signal); different keys give independent
    vectors. One vectorized Arrow pass; pure uint64 wrap arithmetic,
    mirrored value-exactly in DuckDB."""
    from pyspark.sql import functions as F

    key = (dim, salt)
    if key not in _EMB_UDFS:

        @F.pandas_udf("array<double>")
        def emb(k: pd.Series) -> pd.Series:
            if not len(k):
                return pd.Series([], dtype=object)
            with np.errstate(over="ignore"):
                K = (
                    k.to_numpy(dtype=np.int64).astype(np.uint64)[:, None]
                    + np.uint64(salt)
                    + np.arange(dim, dtype=np.uint64)[None, :]
                )
                h = _splitmix64(K)
            v = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2.0 - 1.0
            return pd.Series(list(v))

        _EMB_UDFS[key] = emb
    return _EMB_UDFS[key](col)
