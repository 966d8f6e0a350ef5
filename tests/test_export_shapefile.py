"""Shapefile export round-trip (reference to_shapefile,
docs/guides/tiling_system.ipynb:331). The reader here is an
independent minimal parser of the spec, not the writer inverted."""

from __future__ import annotations

import struct

import numpy as np

from equi7grid_spark.export import tile_footprint_lonlat, tiles_to_shapefile
from equi7grid_spark.roi import get_tiles_in_geog_bbox


def _read_shp(path):
    buf = path.read_bytes()
    assert struct.unpack(">i", buf[:4])[0] == 9994
    version, shape_type = struct.unpack("<2i", buf[28:36])
    assert version == 1000 and shape_type == 5
    file_words = struct.unpack(">i", buf[24:28])[0]
    assert file_words * 2 == len(buf)
    off = 100
    out = []
    while off < len(buf):
        recno, clen = struct.unpack(">2i", buf[off : off + 8])
        off += 8
        st = struct.unpack("<i", buf[off : off + 4])[0]
        assert st == 5
        n_parts, n_pts = struct.unpack("<2i", buf[off + 36 : off + 44])
        pts_off = off + 44 + 4 * n_parts
        pts = np.frombuffer(buf, "<f8", count=n_pts * 2, offset=pts_off).reshape(-1, 2)
        out.append(pts)
        off += clen * 2
    return out


def _read_dbf(path):
    buf = path.read_bytes()
    n_recs, hdr, rec = struct.unpack("<IHH", buf[4:12])
    names = []
    for i in range(n_recs):
        row = buf[hdr + i * rec : hdr + (i + 1) * rec]
        names.append(row[1:21].decode().strip())
    return names


def test_shapefile_roundtrip(tmp_path):
    tiles = get_tiles_in_geog_bbox((16, 48, 18, 50), "T6")
    assert len(tiles) == 4
    out = tmp_path / "tiles.shp"
    tiles_to_shapefile(tiles, out)
    for ext in (".shp", ".shx", ".dbf", ".prj"):
        assert out.with_suffix(ext).exists()

    polys = _read_shp(out)
    names = _read_dbf(out.with_suffix(".dbf"))
    assert names == [t.tilename for t in tiles]
    for t, pts in zip(tiles, polys):
        ring = tile_footprint_lonlat(t.subgrid, t.ll_x, t.ll_y, t.tile_size)
        if not (ring[0] == ring[-1]).all():
            ring = np.vstack([ring, ring[:1]])
        # written rings are CW; match either orientation
        same = np.allclose(pts, ring) or np.allclose(pts, ring[::-1])
        assert same
    # the union of footprints covers the query bbox center
    allpts = np.vstack(polys)
    assert allpts[:, 0].min() < 17 < allpts[:, 0].max()
    assert allpts[:, 1].min() < 49 < allpts[:, 1].max()
