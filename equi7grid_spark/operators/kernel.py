"""Compiled JVM projection kernel: loading + registration.

The flagship's hot per-row math (iterative Vincenty AEQD forward) is
compiled Java (equi7grid_spark/jvm/src, built to equi7-kernel.jar by
scripts/build_jvm_kernel.sh and checked in). One JIT-hot method per row
beats the unrolled Column-expression chain ~2x (the chain pays ~30
per-operator row copies) and the pandas path ~1.5x (no Python workers,
no Arrow boundary) — and unlike both, it converges the lambda
fixed-point to the same tol=1e-13 as the NumPy kernel, so values agree
to float64 round-off.

Loaded at runtime with ADD JAR + registerJavaFunction, so it works on
ANY SparkSession (including the driver's own), not just ones built by
session.get_spark. Every caller feature-detects via kernel_available()
and falls back to the pure Column implementation
(functions/geodesy_cols) — the engine stays fully functional without
the jar.

SQL functions registered:
  equi7_xy(zc tinyint, lon double, lat double) -> array<double> [x, y]
  equi7_lonlat(zc tinyint, x double, y double) -> array<double>
      [lon, lat] — the AEQD inverse (Vincenty direct problem,
      tol=1e-13), compiled twin of geodesy_cols.with_aeqd_inverse
  equi7_tile_key(zc, lon, lat, ts double) -> bigint packed tile key
      ((floor(x/ts) + 8192) << 14) | (floor(y/ts) + 8192)
  equi7_zone_tile_key(lon, lat, ts) -> bigint (zc << 28) | tile key,
      null when out of every zone — zone resolution included (the
      1-degree cell map + exact boundary parity live in the jar as a
      1.8 MB resource), so the flagship needs one scan, zero joins,
      one shuffle on a single long column.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_KERNEL_STATE: dict[int, bool] = {}


def _kernel_jar() -> Path | None:
    """On-disk jar path; extracts from the package when imported from a
    --py-files zip (data_loader.resource_path), None if absent."""
    direct = Path(__file__).resolve().parents[1] / "jvm" / "equi7-kernel.jar"
    if direct.exists():
        return direct
    try:
        from equi7grid_spark.data_loader import resource_path

        p = Path(resource_path("jvm/equi7-kernel.jar"))
        return p if p.exists() else None
    except Exception:
        return None


def kernel_available(spark: SparkSession) -> bool:
    """Register the compiled kernel on this session (once); False if
    the jar is absent or the session cannot load it."""
    key = id(spark)
    cached = _KERNEL_STATE.get(key)
    if cached is not None:
        return cached
    ok = False
    jar = _kernel_jar()
    if jar is not None:
        try:
            spark.sql(f"ADD JAR '{jar}'")
            spark.udf.registerJavaFunction(
                "equi7_xy", "equi7.VincentyXY", T.ArrayType(T.DoubleType())
            )
            spark.udf.registerJavaFunction(
                "equi7_tile_key", "equi7.TileKey", T.LongType()
            )
            spark.udf.registerJavaFunction(
                "equi7_zone_tile_key", "equi7.ZoneTileKey", T.LongType()
            )
            spark.udf.registerJavaFunction(
                "equi7_lonlat", "equi7.VincentyLonLat", T.ArrayType(T.DoubleType())
            )
            spark.udf.registerJavaFunction(
                "equi7_roundtrip_zone_tile_key",
                "equi7.RoundtripZoneTileKey",
                T.LongType(),
            )
            # Probe through the SAME column-typed wrappers the queries
            # use, with the adversarial dtypes a plain (non-Arrow)
            # session produces (bigint zc, bigint lon/lat) — a literal
            # CAST probe once passed while real queries crashed on a
            # Long->Byte ClassCastException. Feature-detection must fail
            # safe to the Column-Vincenty fallback, never pass-then-crash.
            probe = spark.range(1).select(
                F.lit(3).cast("bigint").alias("zc"),
                F.lit(15).cast("bigint").alias("lon"),
                F.lit(48).cast("bigint").alias("lat"),
            )
            row = probe.select(
                tile_key_col(F.col("zc"), F.col("lon"), F.col("lat"), 600000.0),
                zone_tile_key_col(F.col("lon"), F.col("lat"), 600000.0),
                xy_col(F.col("zc"), F.col("lon"), F.col("lat")),
                lonlat_col(
                    F.col("zc"),
                    F.lit(5837287.8).cast("bigint"),
                    F.lit(2121415.7).cast("bigint"),
                ),
            ).collect()
            ok = all(v is not None for v in row[0])
        except Exception:
            ok = False
    _KERNEL_STATE[key] = ok
    return ok


def tile_key_col(zc: Column, lon: Column, lat: Column, tile_size: float) -> Column:
    # The kernel boundary owns its types: registerJavaFunction performs
    # no input coercion, so a bigint zc reaches UDF4<Byte,...> as a Long
    # and throws ClassCastException at runtime. Cast defensively here
    # (and in xy_col) rather than trusting every call site's inference.
    return F.call_udf(
        "equi7_tile_key",
        zc.cast("tinyint"),
        lon.cast("double"),
        lat.cast("double"),
        F.lit(float(tile_size)),
    )


def zone_tile_key_col(lon: Column, lat: Column, tile_size: float) -> Column:
    return F.call_udf(
        "equi7_zone_tile_key",
        lon.cast("double"),
        lat.cast("double"),
        F.lit(float(tile_size)),
    )


def roundtrip_zone_tile_key_col(
    lon: Column, lat: Column, tile_size: float
) -> Column:
    """Packed zone+tile key of forward(inverse(forward(lon, lat))) —
    the fused roundtrip-closure kernel (same Vincenty calls as
    xy_col → lonlat_col → xy_col, one UDF invocation per row)."""
    return F.call_udf(
        "equi7_roundtrip_zone_tile_key",
        lon.cast("double"),
        lat.cast("double"),
        F.lit(float(tile_size)),
    )


def unpack_zc(ztkey: Column) -> Column:
    return F.shiftright(ztkey, 28).cast("tinyint")


def xy_col(zc: Column, lon: Column, lat: Column) -> Column:
    return F.call_udf("equi7_xy", zc.cast("tinyint"), lon.cast("double"), lat.cast("double"))


def lonlat_col(zc: Column, x: Column, y: Column) -> Column:
    """[lon, lat] from (zone code, x, y) — compiled AEQD inverse."""
    return F.call_udf(
        "equi7_lonlat", zc.cast("tinyint"), x.cast("double"), y.cast("double")
    )


def unpack_tx(tkey: Column) -> Column:
    return (F.shiftright(tkey, 14).bitwiseAND(F.lit(16383)) - F.lit(8192)).cast("long")


def unpack_ty(tkey: Column) -> Column:
    return (tkey.bitwiseAND(F.lit(16383)) - F.lit(8192)).cast("long")
