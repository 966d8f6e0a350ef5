"""Synthesize an sf1 bench directory (10x the sf0.1 rows) for the
round-4 off-small-file-regime bench point (VERDICT r3 #7).

The driver ships sf{0.001,0.01,0.1}; correctness gates stay on those.
This script builds /tmp/sf1 deterministically FROM the driver's sf0.1
parquet (no external data): each table is unioned 10 times with
copy-index key shifts so join fan-outs and group cardinalities keep
their sf0.1 shape (keys stay unique; derived lon/lat spread over the
same global distribution). Text/embedding payloads are copied verbatim,
so each document/vector becomes a 10-member near-duplicate cluster —
which is what a real 10x web corpus looks like to the dedup operators
(duplicate clusters, not fresh text) and makes the dedup queries
strictly HARDER at sf1, not easier.

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

COPIES = 10
SRC = "/root/testdata/sf0.1"

# key columns shifted per copy (kept unique across copies; shift far
# above each table's sf0.1 key range)
SHIFTS = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
}
SMALL = ["region", "nation"]  # dimension tables: copied once, unshifted


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    from pyspark.sql import functions as F

    from equi7grid_spark.session import get_spark

    spark = get_spark(app_name="make_sf1", master="local[32]", shuffle_partitions=32)
    for name in SMALL:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: copied")
    for name, shifts in SHIFTS.items():
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(COPIES):
            c = base
            for col, step in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(c)
        allp = parts[0]
        for p in parts[1:]:
            allp = allp.unionByName(p)
        allp.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"{name}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
