"""WGS84 Vincenty geodesics as pure Spark Column expressions (JVM-side).

The flagship tile-assignment job's hot path: the AEQD forward
projection (reference lonlat_to_xy, tests/test_equi7grid.py:59-99) is
the Vincenty *inverse* geodesic problem from the zone's projection
center to the point. Here it is unrolled into Column algebra — no
Python worker, no Arrow boundary — so the projection scales with JVM
cores alone.

Numerical contract: mirrors equi7grid_spark.geodesy.geodesic_inverse
(the NumPy kernel behind the pandas-UDF path) term for term. The NumPy
kernel iterates the lambda fixed-point to tol=1e-13; this one unrolls
ITERS=6 rounds, which is the measured convergence floor for in-zone
points (max |Δx,Δy| vs the converged kernel: 6.2e-7 m at 6 rounds,
identical at 8 — the iteration contracts ~1e-3/round and every zone
point is far from the antipode). tests/test_assign_jvm.py pins
max |Δx,Δy| < 1e-6 m over dense per-zone grids, 10^6x tighter than the
reference golden gate (rtol 1e-7 of ~5e6 m).

Physical-plan design — this function is performance-critical, so the
shape is deliberate:

- Each iteration materializes ONLY the trig/sqrt terms (sin/cos of
  lambda, sigma terms) as named columns across 4 narrow chained
  ``select``s; cheap arithmetic (sa, csa, C polynomials) is inlined
  and recomputed rather than widening the row. Catalyst's
  CollapseProject keeps the projects separate (the intermediates are
  non-cheap and multiply referenced), so the tree stays linear in the
  iteration count.
- Callers pass ``carry`` to limit pass-through columns: every Project
  in the chain copies the full row, so dragging unused columns
  through ~30 projections is pure memcpy waste.
- The fused whole-stage method for ~30 chained projections exceeds
  HotSpot's 8 KB JIT limit and would run interpreted (~5x slower
  end-to-end, measured); session.py sets
  spark.sql.codegen.hugeMethodLimit=8000 so Spark falls back to
  per-operator codegen for exactly such stages.

Per-zone constants (projection center, false origin) come from
7-literal arrays indexed by the int8 zone code; ConstantFolding turns
them into array literals, so element_at is an O(1) gather with no
per-row allocation.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from equi7grid_spark.constants import (
    DEFAULT_SYSTEM_ORDER,
    SYSTEMS,
    WGS84_A,
    WGS84_B,
    WGS84_F,
)

ITERS = 6

_A = WGS84_A
_B = WGS84_B
_F = WGS84_F


def zone_const(zc: Column, values: list[float]) -> Column:
    """Per-zone constant lookup: int zone code (0-based) -> literal.

    element_at on a 7-literal array; requires 0 <= zc < len(values)
    (ANSI mode throws out-of-bounds otherwise — callers filter first).
    """
    return F.element_at(F.array(*[F.lit(float(v)) for v in values]), zc.cast("int") + 1)


def _system_consts(system_order: tuple[str, ...]) -> dict[str, list[float]]:
    sinU1, cosU1, phi1, lon0, x0, y0 = [], [], [], [], [], []
    for cc in system_order:
        s = SYSTEMS[cc]
        p1 = math.radians(s.lat_0)
        u1 = math.atan((1.0 - _F) * math.tan(p1))
        sinU1.append(math.sin(u1))
        cosU1.append(math.cos(u1))
        phi1.append(p1)
        lon0.append(s.lon_0)
        x0.append(s.x_0)
        y0.append(s.y_0)
    return {
        "sinU1": sinU1,
        "cosU1": cosU1,
        "phi1": phi1,
        "lon0": lon0,
        "x0": x0,
        "y0": y0,
    }


def _out_cols(
    keep: list[str], zc_col: str, carry: list[str] | None, df: DataFrame
) -> list[str]:
    """Output columns: everything kept, minus the auto-prepended zc
    unless the CALLER asked for it. `carry=[]` must mean "nothing but
    the computed columns" — a bare `carry or df.columns` would treat
    the empty list as falsy and leak zc back in."""
    requested = list(df.columns) if carry is None else list(carry)
    return [k for k in keep if k != zc_col or zc_col in requested]


def _system_consts_direct(system_order: tuple[str, ...]) -> dict[str, list[float]]:
    """Per-zone constants for the DIRECT problem, computed in
    geodesy.geodesic_direct's exact formula order (tanU1 -> cosU1 via
    1/sqrt -> sinU1 via product), NOT reused from _system_consts (which
    derives sinU1/cosU1 through atan+sin/cos — last-ulp different)."""
    tanU1, cosU1, sinU1, lon0, x0, y0 = [], [], [], [], [], []
    for cc in system_order:
        s = SYSTEMS[cc]
        t = (1.0 - _F) * math.tan(math.radians(s.lat_0))
        cu = 1.0 / math.sqrt(1.0 + t * t)
        tanU1.append(t)
        cosU1.append(cu)
        sinU1.append(t * cu)
        lon0.append(s.lon_0)
        x0.append(s.x_0)
        y0.append(s.y_0)
    return {
        "tanU1": tanU1,
        "cosU1": cosU1,
        "sinU1": sinU1,
        "lon0": lon0,
        "x0": x0,
        "y0": y0,
    }


def with_aeqd_inverse(
    df: DataFrame,
    zc_col: str = "zc",
    x_col: str = "x",
    y_col: str = "y",
    lon_col: str = "lon",
    lat_col: str = "lat",
    system_order: tuple[str, ...] = DEFAULT_SYSTEM_ORDER,
    iters: int = ITERS,
    carry: list[str] | None = None,
) -> DataFrame:
    """Add AEQD-inverse (lon, lat) columns from (zone code, x, y) —
    the Vincenty DIRECT geodesic problem from the zone center along
    azimuth atan2(dx, dy) for distance hypot(dx, dy), unrolled into
    Column algebra like with_aeqd_forward (reference xy_to_lonlat,
    tests/test_equi7grid.py:50-56).

    This is the JVM-side scale path for the inverse projection (the
    round-1 pandas UDF operators/assign.inverse_lonlat_udf remains the
    API-parity fallback). Numerical contract: mirrors
    geodesy.geodesic_direct term for term; the sigma fixed-point
    contracts at ~B (<= 4e-3 in-zone) per round, so ITERS=6 sits far
    below float64 round-off — tests pin < 1e-9 deg vs the converged
    NumPy kernel and roundtrip closure through with_aeqd_forward.

    At the zone center (x, y) == (x0, y0): az = atan2(0, 0) = 0,
    sigma converges to 0, and the closing formulae yield exactly
    (lon0, lat_0) like the NumPy kernel — no special-casing needed.
    """
    c = _system_consts_direct(tuple(system_order))
    zc = F.col(zc_col)
    keep = list(df.columns) if carry is None else list(carry)
    if zc_col not in keep:
        keep = [zc_col, *keep]

    tanU1 = zone_const(zc, c["tanU1"])
    cosU1 = zone_const(zc, c["cosU1"])
    sinU1 = zone_const(zc, c["sinU1"])

    # --- setup: distance + azimuth from the projected offsets ---
    d = df.select(
        *keep,
        F.hypot(F.col(x_col) - zone_const(zc, c["x0"]),
                F.col(y_col) - zone_const(zc, c["y0"])).alias("__s"),
        F.atan2(F.col(x_col) - zone_const(zc, c["x0"]),
                F.col(y_col) - zone_const(zc, c["y0"])).alias("__az1"),
    )
    d = d.select(
        *keep, "__s",
        F.sin("__az1").alias("__sina1"),
        F.cos("__az1").alias("__cosa1"),
    )
    sina1, cosa1 = F.col("__sina1"), F.col("__cosa1")
    # cheap arithmetic, inlined per the forward's plan design
    sin_alpha = cosU1 * sina1
    csa = 1.0 - sin_alpha * sin_alpha
    u2 = csa * F.lit((_A * _A - _B * _B) / (_B * _B))
    d = d.select(
        *keep, "__s", "__sina1", "__cosa1",
        F.atan2(tanU1, cosa1).alias("__sig1"),
        (
            1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
        ).alias("__Ab"),
        (
            u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
        ).alias("__Bb"),
    )
    d = d.select(
        *keep, "__sina1", "__cosa1", "__sig1", "__Bb",
        (F.col("__s") / (F.lit(_B) * F.col("__Ab"))).alias("__sig0"),
    )
    base = [*keep, "__sina1", "__cosa1", "__sig1", "__Bb", "__sig0"]
    d = d.select(*base, F.col("__sig0").alias("__sig"))

    Bb, sig0, sig1 = F.col("__Bb"), F.col("__sig0"), F.col("__sig1")
    for _ in range(iters):
        # P1: trig of the current sigma (the only non-cheap terms)
        d = d.select(
            *base,
            F.cos(2.0 * sig1 + F.col("__sig")).alias("__c2sm"),
            F.sin("__sig").alias("__ssig"),
            F.cos("__sig").alias("__csig"),
        )
        c2sm, ssig, csig = F.col("__c2sm"), F.col("__ssig"), F.col("__csig")
        delta = Bb * ssig * (
            c2sm
            + Bb / 4.0 * (
                csig * (-1.0 + 2.0 * c2sm * c2sm)
                - Bb / 6.0 * c2sm * (-3.0 + 4.0 * ssig * ssig)
                * (-3.0 + 4.0 * c2sm * c2sm)
            )
        )
        d = d.select(*base, (sig0 + delta).alias("__sig"))

    # --- closing: trig at the final sigma, then phi2 / lambda / L ---
    d = d.select(
        *base, "__sig",
        F.cos(2.0 * sig1 + F.col("__sig")).alias("__c2sm"),
        F.sin("__sig").alias("__ssig"),
        F.cos("__sig").alias("__csig"),
    )
    c2sm, ssig, csig = F.col("__c2sm"), F.col("__ssig"), F.col("__csig")
    tmp = sinU1 * ssig - cosU1 * csig * cosa1
    d = d.select(
        *keep, "__sig", "__c2sm", "__ssig", "__csig", "__sina1", "__cosa1",
        F.atan2(
            sinU1 * csig + cosU1 * ssig * cosa1,
            F.lit(1.0 - _F) * F.hypot(sin_alpha, tmp),
        ).alias("__phi2"),
        F.atan2(ssig * sina1, cosU1 * csig - sinU1 * ssig * cosa1).alias("__lam"),
    )
    Cc = F.lit(_F / 16.0) * csa * (4.0 + _F * (4.0 - 3.0 * csa))
    Lval = F.col("__lam") - (1.0 - Cc) * _F * sin_alpha * (
        F.col("__sig")
        + Cc * ssig * (c2sm + Cc * csig * (-1.0 + 2.0 * c2sm * c2sm))
    )
    out_cols = _out_cols(keep, zc_col, carry, df)
    return d.select(
        *out_cols,
        (
            F.pmod(
                zone_const(zc, c["lon0"]) + F.degrees(Lval) + F.lit(180.0),
                F.lit(360.0),
            )
            - F.lit(180.0)
        ).alias(lon_col),
        F.degrees("__phi2").alias(lat_col),
    )


def with_aeqd_forward(
    df: DataFrame,
    zc_col: str = "zc",
    lon_col: str = "lon",
    lat_col: str = "lat",
    x_col: str = "x",
    y_col: str = "y",
    system_order: tuple[str, ...] = DEFAULT_SYSTEM_ORDER,
    iters: int = ITERS,
    carry: list[str] | None = None,
) -> DataFrame:
    """Add AEQD-forward (x, y) columns from (zone code, lon, lat).

    ``carry``: columns to keep in the output besides x/y (default: all
    input columns). Precondition: zc_col indexes system_order (callers
    filter zc >= 0 first).
    """
    c = _system_consts(tuple(system_order))
    zc = F.col(zc_col)
    keep = list(df.columns) if carry is None else list(carry)
    if zc_col not in keep:
        keep = [zc_col, *keep]

    # --- setup: auxiliary latitude + normalized longitude difference ---
    d = df.select(
        *keep,
        F.radians(
            F.pmod(F.col(lon_col) - zone_const(zc, c["lon0"]) + F.lit(180.0), F.lit(360.0))
            - F.lit(180.0)
        ).alias("__L"),
        F.radians(F.col(lat_col)).alias("__phi2"),
    )
    d = d.select(
        "*", F.atan(F.lit(1.0 - _F) * F.tan(F.col("__phi2"))).alias("__U2")
    )
    d = d.select(
        *keep,
        "__L",
        "__phi2",
        F.sin("__U2").alias("__sinU2"),
        F.cos("__U2").alias("__cosU2"),
        F.col("__L").alias("__lam"),
    )

    sinU1 = zone_const(zc, c["sinU1"])
    cosU1 = zone_const(zc, c["cosU1"])
    sinU2, cosU2 = F.col("__sinU2"), F.col("__cosU2")
    L = F.col("__L")
    base = [*keep, "__L", "__phi2", "__sinU2", "__cosU2"]

    # inlined cheap arithmetic (recomputed instead of widening the row)
    def _sa(ss: Column, sl: Column) -> Column:
        return F.when(ss != 0.0, cosU1 * cosU2 * sl / ss).otherwise(F.lit(0.0))

    def _csa(ss: Column, sl: Column) -> Column:
        sa = _sa(ss, sl)
        return 1.0 - sa * sa

    def _C(csa: Column) -> Column:
        return F.lit(_F / 16.0) * csa * (4.0 + _F * (4.0 - 3.0 * csa))

    for it in range(iters):
        last = it == iters - 1
        # P1: trig of the current lambda
        d = d.select(
            *base, "__lam", F.sin("__lam").alias("__sl"), F.cos("__lam").alias("__cl")
        )
        sl, cl = F.col("__sl"), F.col("__cl")
        # P2: sigma terms (hypot = the only sqrt)
        d = d.select(
            *base,
            "__sl",
            F.hypot(cosU2 * sl, cosU1 * sinU2 - sinU1 * cosU2 * cl).alias("__ss"),
            (sinU1 * sinU2 + cosU1 * cosU2 * cl).alias("__cs"),
        )
        ss, cs = F.col("__ss"), F.col("__cs")
        # P3: atan2 + the c2sm guard; sa/csa/C inline (cheap arith)
        csa = _csa(ss, sl)
        d = d.select(
            *base,
            "__sl",
            "__ss",
            "__cs",
            F.atan2(ss, cs).alias("__sig"),
            F.when(csa != 0.0, cs - 2.0 * sinU1 * sinU2 / csa)
            .otherwise(F.lit(0.0))
            .alias("__c2sm"),
            csa.alias("__csa"),
        )
        c2sm = F.col("__c2sm")
        Cc = _C(F.col("__csa"))
        lam_new = (
            L
            + (1.0 - Cc)
            * _F
            * _sa(ss, sl)
            * (
                F.col("__sig")
                + Cc * ss * (c2sm + Cc * cs * (-1.0 + 2.0 * c2sm * c2sm))
            )
        ).alias("__lam")
        if last:
            # keep the closing-section inputs from the final round
            d = d.select(*base, "__ss", "__cs", "__sig", "__c2sm", "__csa", lam_new)
        else:
            d = d.select(*base, lam_new)

    # --- closing formulae (mirrors geodesy.geodesic_inverse post-loop) ---
    u2 = F.col("__csa") * F.lit((_A * _A - _B * _B) / (_B * _B))
    d = d.select(
        *base,
        "__ss",
        "__cs",
        "__sig",
        "__c2sm",
        "__lam",
        (
            u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
        ).alias("__Bb"),
        (
            1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
        ).alias("__Ab"),
    )
    ss, cs, c2sm, Bb = F.col("__ss"), F.col("__cs"), F.col("__c2sm"), F.col("__Bb")
    dsig = (
        Bb
        * ss
        * (
            c2sm
            + Bb
            / 4.0
            * (
                cs * (-1.0 + 2.0 * c2sm * c2sm)
                - Bb / 6.0 * c2sm * (-3.0 + 4.0 * ss * ss) * (-3.0 + 4.0 * c2sm * c2sm)
            )
        )
    )
    coincident = (F.abs(zone_const(zc, c["phi1"]) - F.col("__phi2")) < 1e-15) & (
        F.abs(L) < 1e-15
    )
    d = d.select(
        *keep,
        F.when(coincident, F.lit(0.0))
        .otherwise(F.lit(_B) * F.col("__Ab") * (F.col("__sig") - dsig))
        .alias("__s"),
        F.when(coincident, F.lit(0.0))
        .otherwise(
            F.atan2(
                cosU2 * F.sin("__lam"),
                cosU1 * sinU2 - sinU1 * cosU2 * F.cos("__lam"),
            )
        )
        .alias("__az1"),
    )
    out_cols = _out_cols(keep, zc_col, carry, df)
    return d.select(
        *out_cols,
        (zone_const(zc, c["x0"]) + F.col("__s") * F.sin("__az1")).alias(x_col),
        (zone_const(zc, c["y0"]) + F.col("__s") * F.cos("__az1")).alias(y_col),
    )
