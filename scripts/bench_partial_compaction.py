"""Partial-compaction maintenance A/B (round 6): on a mostly-healthy
table, how much cheaper is rewriting only the fragmented partitions
than a full compact — and does the pruned rewrite restore the same
read performance?

Builds the realistic maintenance shape: one big healthy base commit
(most partitions, one snapshot directory) plus K late incremental
commits (one directory each — the streaming/incremental residue).
plan_compaction() must pick exactly the K residue partitions; we then
time compact(partitions=plan) vs a full compact() of the same table
(fresh copy), and a full-read before/after. Prints one JSON line.

Usage: python scripts/bench_partial_compaction.py [rows] [n_parts] [k_frag]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from equi7grid_spark.session import get_spark  # noqa: E402
from equi7grid_spark.table.manifest import IcebergLiteTable  # noqa: E402


def build(spark, root: str, rows: int, n_parts: int, k_frag: int) -> IcebergLiteTable:
    t = IcebergLiteTable(root)
    chunk = rows // n_parts
    df = spark.range(rows).select(
        F.concat(
            F.lit("p"),
            F.lpad(
                F.least(F.floor(F.col("id") / chunk), F.lit(n_parts - 1))
                .cast("string"), 3, "0",
            ),
        ).alias("part"),
        F.col("id").alias("v"),
    ).localCheckpoint()
    healthy = [f"p{i:03d}" for i in range(n_parts - k_frag)]
    frag = [f"p{i:03d}" for i in range(n_parts - k_frag, n_parts)]
    t.write_partitioned(
        df.filter(F.col("part").isin(healthy)), "part", stat_cols=["v"]
    )
    # K late commits, one directory each — the incremental residue
    t.write_partitioned_incremental(
        df.filter(F.col("part").isin(frag)), "part", group_size=1,
        materialize=False, stat_cols=["v"],
    )
    return t


def timed_read(spark, t):
    t0 = time.time()
    t.read(spark).groupBy("part").agg(F.sum("v")).count()
    return time.time() - t0


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k_frag = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    spark = get_spark(app_name="partial_compaction_ab", master="local[32]",
                      shuffle_partitions=64)
    with tempfile.TemporaryDirectory() as d:
        t = build(spark, f"{d}/tbl", rows, n_parts, k_frag)
        # identical second copy for the full-compact side
        shutil.copytree(f"{d}/tbl", f"{d}/tbl_full")
        t_full = IcebergLiteTable(f"{d}/tbl_full")

        plan = t.plan_compaction(max_dirs=2)
        assert sorted(plan["rewrite"]) == [
            f"p{i:03d}" for i in range(n_parts - k_frag, n_parts)
        ], plan
        timed_read(spark, t)  # warm
        read_pre = min(timed_read(spark, t) for _ in range(2))

        t0 = time.time()
        mp = t.compact(spark, partitions=plan["rewrite"])
        partial_wall = time.time() - t0
        t0 = time.time()
        mf = t_full.compact(spark)
        full_wall = time.time() - t0

        read_partial = min(timed_read(spark, t) for _ in range(2))
        read_full = min(timed_read(spark, t_full) for _ in range(2))
        rows_same = (
            t.read(spark).count() == t_full.read(spark).count() == rows
        )
        print(json.dumps({
            "metric": "partial_compaction_ab",
            "rows": rows,
            "n_parts": n_parts,
            "k_fragmented": k_frag,
            "planned_rewrite": len(plan["rewrite"]),
            "partial_compact_sec": round(partial_wall, 3),
            "full_compact_sec": round(full_wall, 3),
            "partial_bytes_moved": mp["bytes_after"],
            "full_bytes_moved": mf["bytes_after"],
            "read_pre_sec": round(read_pre, 3),
            "read_post_partial_sec": round(read_partial, 3),
            "read_post_full_sec": round(read_full, 3),
            "rows_equal": rows_same,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
