"""Grid definition (de)serialization — the reference's JSON round trip
(reference core.py:605-648: to_grid_def / from_grid_def / to_file /
from_file; _create_grids.py:103-108 write_grid_def).

The JSON captures everything needed to reconstruct a GridConfig plus
the seven projection-system definitions; zone geometry stays in the
engine's data artifacts (referenced by name, as the reference
references its zone parquets by path)."""

from __future__ import annotations

import json
from pathlib import Path

from equi7grid_spark.constants import (
    GridConfig,
    SYSTEMS,
    make_grid_config,
)

GRID_DEF_VERSION = 1


def grid_to_def(config: GridConfig) -> dict:
    """Serializable grid definition (reference to_grid_def)."""
    return {
        "version": GRID_DEF_VERSION,
        "kind": "equi7grid_spark",
        "sampling": dict(config.sampling),
        "tilings": dict(config.tilings),
        "buffered": config.buffered,
        "system_order": list(config.system_order),
        "systems": {
            cc: {
                "epsg": s.epsg,
                "lat_0": s.lat_0,
                "lon_0": s.lon_0,
                "x_0": s.x_0,
                "y_0": s.y_0,
                "min_xy": list(s.min_xy),
                "zone_data": f"zones_geog.npz:{cc}",
            }
            for cc, s in SYSTEMS.items()
            if cc in config.system_order
        },
    }


def grid_from_def(d: dict) -> GridConfig:
    """Rebuild a GridConfig from a grid definition (reference
    from_grid_def). Projection parameters are validated against the
    engine's constants — a mismatch means the JSON targets a different
    grid family."""
    if d.get("kind") != "equi7grid_spark":
        raise ValueError("not an equi7grid_spark grid definition")
    for cc, sd in d.get("systems", {}).items():
        ref = SYSTEMS.get(cc)
        if ref is None or ref.epsg != sd["epsg"] or ref.x_0 != sd["x_0"]:
            raise ValueError(f"system {cc} does not match engine constants")
    # user tiling levels (reference get_user_equi7grid) travel in the
    # definition; register them so a fresh process can resolve the ids
    from equi7grid_spark.constants import register_tiling

    for tid, size in d.get("tilings", {}).items():
        register_tiling(tid, int(size))
    cfg = make_grid_config(
        {tid: float(s) for tid, s in d["sampling"].items()},
        buffered=bool(d.get("buffered", False)),
        continent_order=list(d["system_order"]),
    )
    return cfg


def grid_to_file(config: GridConfig, path: str | Path) -> None:
    Path(path).write_text(json.dumps(grid_to_def(config), indent=1))


def grid_from_file(path: str | Path) -> GridConfig:
    return grid_from_def(json.loads(Path(path).read_text()))
