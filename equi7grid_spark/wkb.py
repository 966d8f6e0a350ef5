"""Minimal WKB (well-known binary) geometry parser in NumPy.

The sandbox has no shapely/GEOS, so the Equi7 zone polygons (GeoParquet
`geometry: binary` columns, plain ISO WKB Polygon/MultiPolygon — format
verified against /root/reference/src/equi7grid/data/zones/*.parquet) are
parsed directly into NumPy vertex arrays.

Only the geometry types the engine needs are supported:
Point(1), Polygon(3), MultiPolygon(6), in either byte order, 2D only.
"""

from __future__ import annotations

import struct

import numpy as np

_POINT = 1
_POLYGON = 3
_MULTIPOLYGON = 6


def _parse_polygon_body(buf: bytes, off: int, bo: str) -> tuple[list[np.ndarray], int]:
    (n_rings,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    rings = []
    for _ in range(n_rings):
        (n_pts,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        pts = np.frombuffer(buf, dtype=("<f8" if bo == "<" else ">f8"), count=n_pts * 2, offset=off)
        off += n_pts * 16
        rings.append(pts.reshape(n_pts, 2).astype(np.float64))
    return rings, off


def parse_wkb(buf: bytes) -> list[list[np.ndarray]]:
    """Parse WKB into a list of polygons; each polygon is a list of rings
    (first = exterior, rest = holes); each ring an (n, 2) float64 array of
    (x, y) i.e. (lon, lat) for EPSG:4326 sources.
    """
    off = 0
    byte_order = buf[off]
    bo = "<" if byte_order == 1 else ">"
    off += 1
    (gtype,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    # EWKB flags: Z/M/SRID are additional data the plain-2D parser below
    # cannot skip — masking them away would misparse the payload (e.g.
    # the 4 SRID bytes as a ring count, silently corrupting coordinates;
    # ADVICE round-1). SRID is the one flag with a fixed-size prefix we
    # can consume; dimensional flags are rejected with a clear error.
    _EWKB_Z, _EWKB_M, _EWKB_SRID = 0x80000000, 0x40000000, 0x20000000
    if gtype & (_EWKB_Z | _EWKB_M):
        raise ValueError(
            f"EWKB Z/M geometry (type 0x{gtype:08x}) not supported: "
            "this parser reads 2D coordinates only"
        )
    if gtype & _EWKB_SRID:
        off += 4  # skip the SRID payload
        gtype &= ~_EWKB_SRID
    if gtype >= 1000:  # ISO WKB Z (1000+), M (2000+), ZM (3000+)
        raise ValueError(
            f"ISO WKB geometry type {gtype} has Z/M dimensions: "
            "this parser reads 2D coordinates only"
        )

    if gtype == _POLYGON:
        rings, _ = _parse_polygon_body(buf, off, bo)
        return [rings]
    if gtype == _MULTIPOLYGON:
        (n_polys,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        polys = []
        for _ in range(n_polys):
            sub_bo = "<" if buf[off] == 1 else ">"
            off += 1
            (sub_type,) = struct.unpack_from(sub_bo + "I", buf, off)
            off += 4
            if (sub_type & 0xFF) != _POLYGON:
                raise ValueError(f"unexpected sub-geometry type {sub_type}")
            rings, off = _parse_polygon_body(buf, off, sub_bo)
            polys.append(rings)
        return polys
    if gtype == _POINT:
        x, y = struct.unpack_from(bo + "dd", buf, off)
        return [[np.array([[x, y]], dtype=np.float64)]]
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def polygon_wkb(rings: list[np.ndarray]) -> bytes:
    """Serialize one polygon (list of (n,2) rings) to little-endian WKB."""
    out = [b"\x01", struct.pack("<I", _POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        r = np.asarray(ring, dtype="<f8")
        out.append(struct.pack("<I", r.shape[0]))
        out.append(r.tobytes())
    return b"".join(out)
