"""Tile-catalog access: the materialized tiles-per-zone relation.

Built once by scripts/prepare_data.py (tiles of each standard level
whose square intersects the projected zone polygon — the reference
computes these on the fly from its TMS, reference core.py:79-107,
docs/guides/tiling_system.ipynb). ~65k rows for T6+T3+T1 globally:
small enough to broadcast to every executor and to drive broadcast
joins on the Spark side.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

from equi7grid_spark.data_loader import data_path

from equi7grid_spark.constants import TILING_ID_TO_SIZE

DATA_DIR = Path(__file__).parent / "data"


@lru_cache(maxsize=1)
def load_catalog_table():
    """The full catalog as a pyarrow table."""
    return pq.read_table(data_path("tile_catalog.parquet"))


@lru_cache(maxsize=64)
def computed_cells(
    subgrid: str, tiling_id: str, variant: str = "std"
) -> dict[tuple[int, int], tuple[str, bool]]:
    """Runtime catalog for tilings outside the prepared parquet (user
    tiling definitions, reference get_user_equi7grid core.py:538-569):
    tiles of the registered size whose square intersects the projected
    zone polygon, anchored at min_xy, with the engine-defined sampled
    covers_land — the same construction scripts/prepare_data.py
    materializes for the standard levels."""
    from equi7grid_spark.constants import SYSTEMS
    from equi7grid_spark.geom import cells_intersecting_polys
    from equi7grid_spark.land import covers_land_sampled
    from equi7grid_spark.zones import load_zone_polys_proj

    ts = float(TILING_ID_TO_SIZE[tiling_id])
    proj = load_zone_polys_proj(variant)[subgrid]
    ix, iy, _ = cells_intersecting_polys(proj, ts)
    min_x, min_y = SYSTEMS[subgrid].min_xy
    keep = (ix * ts >= min_x - 1e-6) & (iy * ts >= min_y - 1e-6)
    ix, iy = ix[keep], iy[keep]
    covers = covers_land_sampled(subgrid, ix, iy, ts, 8, variant)
    out: dict[tuple[int, int], tuple[str, bool]] = {}
    for a, b, c in zip(ix.tolist(), iy.tolist(), covers.tolist()):
        tx, ty = int(a * ts / 1e5), int(b * ts / 1e5)
        ns = "S" if ty < 0 else "N"
        name = f"{subgrid}_E{tx:03d}{ns}{abs(ty):03d}T{tiling_id[1:]}"
        out[(int(a), int(b))] = (name, bool(c))
    return out


@lru_cache(maxsize=64)
def catalog_cells(
    subgrid: str, tiling_id: str, variant: str = "std"
) -> dict[tuple[int, int], tuple[str, bool]]:
    """(cell_ix, cell_iy) -> (tilename, covers_land) for one zone+level
    (+ zone variant: 'std' or the ~100km land-buffered 'bfrd').
    Standard levels come from the prepared parquet; registered user
    tilings are computed on the fly (computed_cells)."""
    if tiling_id not in ("T6", "T3", "T1"):
        return computed_cells(subgrid, tiling_id, variant)
    t = load_catalog_table()
    import pyarrow.compute as pc

    mask = pc.and_(
        pc.and_(pc.equal(t["subgrid"], subgrid), pc.equal(t["tiling_id"], tiling_id)),
        pc.equal(t["variant"], variant),
    )
    sub = t.filter(mask)
    ts = TILING_ID_TO_SIZE[tiling_id]
    ll_x = np.asarray(sub["ll_x"], dtype=np.float64)
    ll_y = np.asarray(sub["ll_y"], dtype=np.float64)
    names = sub["tilename"].to_pylist()
    land = sub["covers_land"].to_pylist()
    ix = np.round(ll_x / ts).astype(np.int64)
    iy = np.round(ll_y / ts).astype(np.int64)
    return {
        (int(a), int(b)): (n, bool(c))
        for a, b, n, c in zip(ix, iy, names, land)
    }


@lru_cache(maxsize=64)
def catalog_name_set(subgrid: str, tiling_id: str, variant: str = "std") -> frozenset[str]:
    return frozenset(n for n, _ in catalog_cells(subgrid, tiling_id, variant).values())
