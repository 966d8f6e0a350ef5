"""Zone assignment goldens (reference tests/test_equi7grid.py:59-99,405-439)."""

import numpy as np

from equi7grid_spark.zones import assign_primary_zone, zone_membership

ORDER = ("AF", "AN", "AS", "EU", "OC", "NA", "SA")


def members(lon, lat, **kw):
    m = zone_membership(np.array([lon]), np.array([lat]), **kw)[0]
    order = kw.get("system_order", ORDER)
    return [cc for cc, f in zip(order, m) if f]


def test_zone_goldens():
    assert members(15.1, 45.3) == ["EU"]
    assert members(-178.5, 67.75) == ["AS"]
    assert members(-178.0, 51.75) == ["NA"]
    assert members(173.0, 53.0) == ["NA"]


def test_continental_transition():
    # reference :405-409 — exactly one zone, AS
    assert members(51.12, 61.71) == ["AS"]


def test_continental_transition_buffered():
    # reference :412-418 — two zones, order AS then EU
    assert members(51.12, 61.71, buffered=True) == ["AS", "EU"]


def test_system_order_restriction():
    # reference :421-428 — EU-only grid does not contain the point
    m = zone_membership(
        np.array([51.12]), np.array([61.71]), system_order=("EU",)
    )
    assert not m.any()


def test_system_order_buffered():
    # reference :431-439 — ["EU", "AS"] order honored
    assert members(51.12, 61.71, buffered=True, system_order=("EU", "AS")) == ["EU", "AS"]


def test_primary_assignment_batch():
    lon = np.array([15.1, -178.5, -178.0, 173.0, 0.0])
    lat = np.array([45.3, 67.75, 51.75, 53.0, 0.0])
    sub = assign_primary_zone(lon, lat)
    assert list(sub[:4]) == ["EU", "AS", "NA", "NA"]
    # (0,0) is in the Gulf of Guinea — zones partition the globe so it
    # belongs to some zone (AF by geography).
    assert sub[4] == "AF"


def test_partition_property():
    # Non-buffered zones partition the globe: every point in exactly 1 zone.
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 2000)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 2000)))
    m = zone_membership(lon, lat)
    counts = m.sum(axis=1)
    assert (counts == 1).mean() > 0.999  # boundary-exact points may be 0/2
    assert counts.max() <= 2
