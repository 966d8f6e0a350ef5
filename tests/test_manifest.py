"""Iceberg-lite snapshot/commit semantics (ADVICE round-1: commits must
be truly atomic — uncommitted data files invisible, resume must not
duplicate rows after a crash between data write and manifest flip)."""

from __future__ import annotations

import pytest

from equi7grid_spark.table.manifest import IcebergLiteTable


def test_crash_between_write_and_commit_is_invisible_and_gcd(spark, tmp_path):
    df = spark.createDataFrame(
        [("EU", 1), ("EU", 2), ("AS", 3)], "subgrid string, v int"
    )
    t = IcebergLiteTable(tmp_path / "tbl")
    m1 = t.write_partitioned(df, "subgrid", meta={"run": 1})
    assert m1["total_rows"] == 3

    # simulate a crashed writer: data landed, manifest flip never happened
    orphan = t.data_dir / "snap-deadbeef"
    df.write.partitionBy("subgrid").parquet(str(orphan))
    assert t.read(spark).count() == 3  # orphan invisible to readers

    # a resumed write garbage-collects the orphan and re-writes nothing
    m2 = t.write_partitioned(df, "subgrid", meta={"run": 2})
    assert m2["newly_written"] == []
    assert m2["skipped_resume"] == ["AS", "EU"]
    assert not orphan.exists()
    assert t.read(spark).count() == 3  # no duplicated rows

    # appending a genuinely new partition lands in its own snapshot dir
    df2 = spark.createDataFrame([("NA", 4)], "subgrid string, v int")
    m3 = t.write_partitioned(df2, "subgrid", meta={"run": 3})
    assert m3["newly_written"] == ["NA"]
    assert t.read(spark).count() == 4
    snap_dirs = {p["snap_dir"] for p in t.current_manifest()["partitions"]}
    assert len(snap_dirs) == 2


def test_read_before_any_commit_raises(spark, tmp_path):
    t = IcebergLiteTable(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        t.read(spark)
