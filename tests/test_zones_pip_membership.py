"""The buffered-membership parity export (zones_pip.membership_cands,
consumed by the zone_assign_buffered_counts oracle) must agree with
the engine's ray-crossing membership (zones.zone_membership) — the
two are different even-odd formulations of the same polygons, so the
certification samples every boundary cell plus global points."""

from __future__ import annotations

import numpy as np

from equi7grid_spark.zones import zone_membership
from equi7grid_spark.zones_pip import membership_cands, membership_numpy


def test_membership_cands_match_engine_membership():
    rng = np.random.default_rng(7)
    in_pairs, cands = membership_cands("bfrd")
    assert len(cands) > 1000 and len(in_pairs) > 10000
    cells = np.array(sorted({c["cell_id"] for c in cands}))
    # >= 1 random point in EVERY boundary cell, plus global scatter
    ix, iy = cells // 180, cells % 180
    lon = (ix - 180) + rng.random(cells.size)
    lat = (iy - 90) + rng.random(cells.size)
    glon = rng.random(3000) * 360.0 - 180.0
    glat = rng.random(3000) * 180.0 - 90.0
    LON = np.concatenate([lon, glon])
    LAT = np.concatenate([lat, glat])
    a = membership_numpy(LON, LAT, "bfrd")
    b = zone_membership(LON, LAT, buffered=True)
    assert (a == b).all()
    # the buffered overlap is real: some points belong to 2 zones
    assert int((b.sum(axis=1) >= 2).sum()) > 0


def test_membership_in_pairs_disjoint_from_cands():
    in_pairs, cands = membership_cands("bfrd")
    in_set = set(in_pairs)
    assert all((c["cell_id"], c["zc"]) not in in_set for c in cands)
