"""One-time prepare job: build the engine's broadcastable grid data.

Converts the reference's published GeoParquet zone polygons
(/root/reference/src/equi7grid/data/zones/*.parquet — MIT-licensed
public data of the Equi7Grid specification) into the engine's own
artifacts under equi7grid_spark/data/:

  zones_geog.npz     lon/lat ring arrays per zone piece (std + bfrd)
  prefilter.npz      1-degree point-in-zone prefilter grids
  zones_proj.npz     0.1-degree-densified, AEQD-projected zone rings
  tile_catalog.parquet  T6/T3/T1 tiles intersecting each zone +
                        engine-defined covers_land (synthetic mask)

This is the Spark-engine analogue of the reference's grid construction
(`Equi7Grid.from_sampling` → `_create_rpts_from_def`, reference
core.py:372-414): run once, the outputs are broadcast at job start.

Usage: python scripts/prepare_data.py [--zones-dir DIR]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from equi7grid_spark.constants import (
    DEF_SEG_LEN_DEG,
    DEFAULT_SYSTEM_ORDER,
    STANDARD_TILINGS,
    SYSTEMS,
)
from equi7grid_spark.geodesy import aeqd_forward
from equi7grid_spark.geom import (
    boundary_cells,
    cells_intersecting_polys,
    densify_ring,
    points_in_polys,
    points_in_rings,
)
from equi7grid_spark.land import covers_land_sampled
from equi7grid_spark.wkb import parse_wkb

DATA_DIR = Path(__file__).resolve().parents[1] / "equi7grid_spark" / "data"
PF_CELL_DEG = 1.0
PF_NX, PF_NY = 360, 180
PF_OUT, PF_IN, PF_BOUNDARY = 0, 1, 2


def load_reference_zones(zones_dir: Path) -> dict[tuple[str, str], list[list[np.ndarray]]]:
    """(cc, variant) -> polygon pieces (lists of rings)."""
    out = {}
    for cc in DEFAULT_SYSTEM_ORDER:
        for variant, suffix in (("std", ""), ("bfrd", "_bfrd")):
            path = zones_dir / f"{cc.lower()}_zone{suffix}.parquet"
            table = pq.read_table(path)
            wkb_bytes = table.column("geometry")[0].as_py()
            polys = parse_wkb(wkb_bytes)
            out[(cc, variant)] = polys
    return out


def save_zones_geog(zones: dict) -> None:
    arrays: dict[str, np.ndarray] = {}
    index = []
    for (cc, variant), polys in zones.items():
        for pi, rings in enumerate(polys):
            for ri, ring in enumerate(rings):
                key = f"{cc}_{variant}_p{pi}_r{ri}"
                arrays[key] = np.asarray(ring, dtype=np.float64)
                index.append(key)
    arrays["index"] = np.array(index)
    np.savez_compressed(DATA_DIR / "zones_geog.npz", **arrays)
    print(f"zones_geog.npz: {len(index)} rings")


def build_prefilter(zones: dict) -> None:
    """1-degree OUT/IN/BOUNDARY grid per (zone, variant)."""
    arrays = {}
    for (cc, variant), polys in zones.items():
        grid = np.zeros((PF_NX, PF_NY), dtype=np.uint8)
        for rings in polys:
            bx, by = boundary_cells(rings, PF_CELL_DEG, origin=(-180.0, -90.0))
            ok = (bx >= 0) & (bx < PF_NX) & (by >= 0) & (by < PF_NY)
            grid[bx[ok], by[ok]] = PF_BOUNDARY
        # Interior fill: center PIP for non-boundary cells.
        gx, gy = np.meshgrid(np.arange(PF_NX), np.arange(PF_NY), indexing="ij")
        m = grid == PF_OUT
        cx = -180.0 + (gx[m] + 0.5) * PF_CELL_DEG
        cy = -90.0 + (gy[m] + 0.5) * PF_CELL_DEG
        inside = points_in_polys(cx, cy, polys)
        vals = np.where(inside, PF_IN, PF_OUT).astype(np.uint8)
        grid[gx[m], gy[m]] = vals
        arrays[f"{cc}_{variant}"] = grid
        n_in = int((grid == PF_IN).sum())
        n_b = int((grid == PF_BOUNDARY).sum())
        print(f"prefilter {cc}/{variant}: in={n_in} boundary={n_b}")
    np.savez_compressed(DATA_DIR / "prefilter.npz", **arrays)


def project_polys(cc: str, polys: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    """Densify rings at DEF_SEG_LEN_DEG in lon/lat then AEQD-project."""
    out = []
    for rings in polys:
        proj_rings = []
        for ring in rings:
            dense = densify_ring(np.asarray(ring, np.float64), DEF_SEG_LEN_DEG)
            x, y = aeqd_forward(cc, dense[:, 0], dense[:, 1])
            proj_rings.append(np.column_stack([x, y]))
        out.append(proj_rings)
    return out


def save_zones_proj(zones: dict) -> dict[tuple[str, str], list[list[np.ndarray]]]:
    arrays: dict[str, np.ndarray] = {}
    index = []
    projected = {}
    for (cc, variant), polys in zones.items():
        proj = project_polys(cc, polys)
        projected[(cc, variant)] = proj
        for pi, rings in enumerate(proj):
            for ri, ring in enumerate(rings):
                key = f"{cc}_{variant}_p{pi}_r{ri}"
                arrays[key] = ring
                index.append(key)
    arrays["index"] = np.array(index)
    np.savez_compressed(DATA_DIR / "zones_proj.npz", **arrays)
    print(f"zones_proj.npz: {len(index)} rings")
    return projected


def tilename(cc: str, ll_x: float, ll_y: float, tiling_id: str) -> str:
    tx, ty = int(ll_x / 1e5), int(ll_y / 1e5)
    ns = "S" if ty < 0 else "N"
    return f"{cc}_E{tx:03d}{ns}{abs(ty):03d}T{tiling_id[1:]}"


def build_catalog(projected: dict, zones_geog: dict) -> None:
    """Tiles intersecting each projected zone polygon (std + buffered
    variants), per level, with engine-defined covers_land from the
    synthetic land mask intersected with each zone (reference
    core.py:403-411 semantics)."""
    rows = {
        "variant": [], "subgrid": [], "tiling_id": [], "level": [], "tilename": [],
        "ll_x": [], "ll_y": [], "covers_land": [], "zone_boundary": [],
    }
    for cc, variant in [(c, v) for c in DEFAULT_SYSTEM_ORDER for v in ("std", "bfrd")]:
        proj = projected[(cc, variant)]
        for level, (tid, ts) in STANDARD_TILINGS.items():
            t0 = time.time()
            ix, iy, isb = cells_intersecting_polys(proj, float(ts))
            # The reference TMS is anchored at min_xy (_create_grids.py:44-80):
            # tiles below the anchor do not exist, even where the zone
            # polygon touches the anchor gridline exactly.
            min_x, min_y = SYSTEMS[cc].min_xy
            keep = (ix * ts >= min_x - 1e-6) & (iy * ts >= min_y - 1e-6)
            ix, iy, isb = ix[keep], iy[keep], isb[keep]
            # covers_land with the reference's land ∩ zone semantics
            # (core.py:403-411: land is intersected with the *zone* in
            # geographic space before projection — e.g. Alaska must not
            # make AS tiles 'land'): sample a kxk grid of tile points,
            # inverse-project, and require a sample inside BOTH the land
            # mask and this zone (geographic PIP).
            k = 24 if ts >= 300000 else 12
            covers = covers_land_sampled(cc, ix, iy, float(ts), k, variant)
            order = np.lexsort((iy, ix))
            for j in order:
                llx, lly = float(ix[j] * ts), float(iy[j] * ts)
                rows["variant"].append(variant)
                rows["subgrid"].append(cc)
                rows["tiling_id"].append(tid)
                rows["level"].append(level)
                rows["tilename"].append(tilename(cc, llx, lly, tid))
                rows["ll_x"].append(llx)
                rows["ll_y"].append(lly)
                rows["covers_land"].append(bool(covers[j]))
                rows["zone_boundary"].append(bool(isb[j]))
            print(
                f"catalog {cc}/{variant}/{tid}: {int(len(ix))} tiles "
                f"({int(covers.sum())} land) in {time.time()-t0:.1f}s"
            )
    table = pa.table({
        "variant": pa.array(rows["variant"], pa.string()),
        "subgrid": pa.array(rows["subgrid"], pa.string()),
        "tiling_id": pa.array(rows["tiling_id"], pa.string()),
        "level": pa.array(rows["level"], pa.int32()),
        "tilename": pa.array(rows["tilename"], pa.string()),
        "ll_x": pa.array(rows["ll_x"], pa.float64()),
        "ll_y": pa.array(rows["ll_y"], pa.float64()),
        "covers_land": pa.array(rows["covers_land"], pa.bool_()),
        "zone_boundary": pa.array(rows["zone_boundary"], pa.bool_()),
    })
    pq.write_table(table, DATA_DIR / "tile_catalog.parquet")
    std = table.filter(pa.compute.equal(table["variant"], "std"))
    t6 = std.filter(pa.compute.equal(std["tiling_id"], "T6"))
    print(
        f"catalog total={table.num_rows} std-T6={t6.num_rows} "
        f"(reference golden: 1801)"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--zones-dir",
        type=Path,
        default=Path("/root/reference/src/equi7grid/data/zones"),
    )
    args = ap.parse_args()
    DATA_DIR.mkdir(parents=True, exist_ok=True)

    zones = load_reference_zones(args.zones_dir)
    for (cc, variant), polys in sorted(zones.items()):
        n_rings = sum(len(r) for r in polys)
        n_vtx = sum(len(ring) for r in polys for ring in r)
        print(f"zone {cc}/{variant}: {len(polys)} pieces, {n_rings} rings, {n_vtx} vertices")
    save_zones_geog(zones)
    build_prefilter(zones)
    projected = save_zones_proj(zones)
    build_catalog(projected, zones)


if __name__ == "__main__":
    main()
