"""Z-order (Morton) key: bit-exact vs a Python reference, and the
layout effect it exists for — compact(sort_cols=[morton]) clusters a
tile table spatially so ROI-shaped reads touch few files."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from equi7grid_spark.functions.tiling import morton_key
from equi7grid_spark.table.manifest import IcebergLiteTable


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_python_reference(spark):
    rng = random.Random(42)
    pts = [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2)] + [
        (rng.randrange(65536), rng.randrange(65536)) for _ in range(500)
    ]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton(x, y, 16), (x, y)
    # max 16-bit key occupies bit 31 and below; bits=31 stays <= bit 62
    assert got[(65535, 65535)] == (1 << 32) - 1


def test_morton_compaction_clusters_files_spatially(spark, tmp_path):
    """After compact(sort_cols=[zkey]) a 64x64 tile grid rolls into
    files whose 2D bounding boxes are near-square neighborhoods: a
    16x16 ROI window intersects FAR fewer files than under the x-major
    row sort (which gives full-width stripes). This is the file-skip
    win z-ordered rewrites buy a 100 TB tile table."""
    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    random.Random(7).shuffle(rows)
    df = (
        spark.createDataFrame(rows, "tx int, ty int")
        .withColumn("zkey", morton_key(F.col("tx"), F.col("ty")))
        .withColumn("part", F.lit("all"))
        .repartition(8)
    )
    files_per_sort = {}
    for sort in ("zkey", "tx"):
        t = IcebergLiteTable(tmp_path / f"tbl_{sort}")
        t.write_partitioned(df, "part", stat_cols=["zkey"])
        t.compact(spark, target_file_rows=256, sort_cols=[sort, "ty"])
        boxes = []
        for f in t.read(spark).inputFiles():
            agg = (
                spark.read.parquet(f)
                .agg(
                    F.min("tx"), F.max("tx"), F.min("ty"), F.max("ty")
                )
                .first()
            )
            boxes.append(tuple(agg))
        # how many files does a 16x16 ROI at (16..31, 16..31) touch?
        files_per_sort[sort] = sum(
            1
            for (x0, x1, y0, y1) in boxes
            if x1 >= 16 and x0 <= 31 and y1 >= 16 and y0 <= 31
        )
        assert len(boxes) == 16  # 4096 rows / 256 per file
    # morton: an aligned 16x16 square is ONE contiguous z-code block,
    # i.e. exactly one 256-row file; x-major: every file is a 4-column
    # full-height stripe, so the same ROI drags in 4 files (each with
    # all 64 rows of its columns)
    assert files_per_sort["zkey"] == 1
    assert files_per_sort["tx"] == 4
