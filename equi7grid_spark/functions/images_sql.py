"""DuckDB-SQL mirror of images.make_batch's lon/lat synthesis.

The synthetic images table (equi7grid_spark/images.py) derives every
row from splitmix64 over the row index — pure uint64 wrap-around
arithmetic. DuckDB's UBIGINT +/* raise on overflow instead of
wrapping, so the mirror routes every add/multiply through HUGEINT
(int128) and takes mod 2^64: for mul64, a*b is split as
a_lo*b + (a_hi*b_lo << 32) with every term < 2^97, far inside
HUGEINT range. xor/>> operate on UBIGINT directly (logical shift).

Float parity: all downstream double arithmetic (u01 = (h>>11)/2^53,
anchor interpolation, asin/degrees) is written in the SAME operation
order as the NumPy kernel; IEEE-754 doubles then agree bit-for-bit
except asin (libm, <=1 ulp) — which only feeds the 15% non-anchored
global-latitude branch, and the consuming oracles aggregate to tile
indices (floor), so a 1-ulp latitude shift only matters within
~1e-10 m of a tile edge. Same floor-robustness argument as the
Vincenty mirror (functions/geodesy_sql.py).
"""

from __future__ import annotations

from equi7grid_spark.images import ANCHORS, P_ANCHOR

_M64 = 1 << 64


def _add64(a: str, b: str) -> str:
    return (
        f"CAST((CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % {_M64} AS UBIGINT)"
    )


def _mul64(a: str, b: str) -> str:
    ah = f"(CAST({a} AS HUGEINT) // 4294967296)"
    al = f"(CAST({a} AS HUGEINT) % 4294967296)"
    bl = f"(CAST({b} AS HUGEINT) % 4294967296)"
    return (
        f"CAST(({al} * CAST({b} AS HUGEINT)"
        f" + ({ah} * {bl}) * 4294967296) % {_M64} AS UBIGINT)"
    )


def _splitmix64_sql(x: str, z1: str, z2: str, z3: str) -> str:
    """Three chained SELECT-list steps (z1..z3 are intermediate column
    names a WITH-chain threads through) ending in the hash value."""
    s1 = _add64(x, "CAST(11400714819323198485 AS UBIGINT)")
    s2 = _mul64(
        f"xor({z1}, {z1} >> 30)", "CAST(13787848793156543929 AS UBIGINT)"
    )
    s3 = _mul64(
        f"xor({z2}, {z2} >> 27)", "CAST(10723151780598845931 AS UBIGINT)"
    )
    return s1, s2, s3, f"xor({z3}, {z3} >> 31)"


def _sm_chain(rel: str, keep: str, x: str, out: str) -> str:
    """CTE text computing out = splitmix64(x) over relation `rel`,
    carrying `keep` columns."""
    a, b, c, d = _splitmix64_sql(x, "_z1", "_z2", "_z3")
    return f"""
      SELECT {keep}, {d} AS {out} FROM (
        SELECT {keep}, {c} AS _z3 FROM (
          SELECT {keep}, {b} AS _z2 FROM (
            SELECT {keep}, {a} AS _z1 FROM {rel}
          )
        )
      )
    """


def _u01(h: str) -> str:
    return f"(CAST(({h} >> 11) AS DOUBLE) / 9007199254740992.0)"


def synthetic_lonlat_sql(n: int, seed: int = 42) -> str:
    """CTE body `img`: (img_id BIGINT, phash BIGINT, lon DOUBLE,
    lat DOUBLE) for the first `n` rows of
    images.synthetic_images(seed) — value-exact twin of make_batch's
    phash and location columns."""
    seed_mix = (seed * 0x9E3779B97F4A7C15) % _M64
    bx0 = ", ".join(repr(b[0]) for b in ANCHORS)
    by0 = ", ".join(repr(b[1]) for b in ANCHORS)
    bx1 = ", ".join(repr(b[2]) for b in ANCHORS)
    by1 = ", ".join(repr(b[3]) for b in ANCHORS)
    idx = f"""
      SELECT k AS img_id, CAST(k AS UBIGINT) AS i
      FROM generate_series(0, {n - 1}) AS t(k)
    """
    h = _sm_chain(
        f"({idx})", "img_id", _add64(f"CAST({seed_mix} AS UBIGINT)", "i"), "h"
    )
    usel = _sm_chain("h_t", "img_id, h", _add64("h", "1"), "sm_sel")
    ubox = _sm_chain("usel_t", "img_id, h, sm_sel", _add64("h", "2"), "sm_box")
    ulon = _sm_chain(
        "ubox_t", "img_id, h, sm_sel, sm_box", _add64("h", "3"), "sm_lon"
    )
    ulat = _sm_chain(
        "ulon_t", "img_id, h, sm_sel, sm_box, sm_lon", _add64("h", "4"), "sm_lat"
    )
    return f"""
    h_t AS ({h}),
    usel_t AS ({usel}),
    ubox_t AS ({ubox}),
    ulon_t AS ({ulon}),
    ulat_t AS ({ulat}),
    u_t AS (
      SELECT img_id,
             CAST(h & CAST(9223372036854775807 AS UBIGINT) AS BIGINT) AS phash,
             {_u01("sm_sel")} AS u_sel,
             CAST(sm_box % 12 AS INT) AS u_box,
             {_u01("sm_lon")} AS u_lon,
             {_u01("sm_lat")} AS u_lat
      FROM ulat_t
    ),
    img AS MATERIALIZED (
      SELECT img_id, phash,
             CASE WHEN u_sel < {P_ANCHOR!r}
                  THEN list_extract([{bx0}], u_box + 1)
                       + u_lon * (list_extract([{bx1}], u_box + 1)
                                  - list_extract([{bx0}], u_box + 1))
                  ELSE u_lon * 360.0 - 180.0 END AS lon,
             CASE WHEN u_sel < {P_ANCHOR!r}
                  THEN list_extract([{by0}], u_box + 1)
                       + u_lat * (list_extract([{by1}], u_box + 1)
                                  - list_extract([{by0}], u_box + 1))
                  ELSE degrees(asin(u_lat * 2.0 - 1.0)) END AS lat
      FROM u_t
    )
    """


def embedding_from_key_sql(
    rel: str, id_col: str, key_col: str, dim: int = 16, salt: int = 1000
) -> str:
    """CTE body chain ending in `emb` (<id_col>, v DOUBLE[dim]) —
    value-exact twin of images.embedding_from_key: explode the dims,
    ONE splitmix64 chain over (key + salt + d), re-aggregate with
    list(... ORDER BY d). The dim explode keeps the chain linear (one
    set of CTE steps total, not one per dimension — the layered-
    projection planning trap in CLAUDE.md)."""
    x = _add64(
        _add64(f"CAST({key_col} AS UBIGINT)", f"CAST({salt} AS UBIGINT)"),
        "CAST(_ed AS UBIGINT)",
    )
    dims = f"""
      SELECT {id_col} AS _eid, _ed, {x} AS _ex
      FROM {rel}, generate_series(0, {dim - 1}) AS _edt(_ed)
    """
    chain = _sm_chain("edims_t", "_eid, _ed", "_ex", "_eh")
    return f"""
    edims_t AS ({dims}),
    embh_t AS ({chain}),
    emb AS MATERIALIZED (
      SELECT _eid AS {id_col},
             list({_u01("_eh")} * 2.0 - 1.0 ORDER BY _ed) AS v
      FROM embh_t GROUP BY _eid
    )
    """
