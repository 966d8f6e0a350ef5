"""Micro-batch throughput of the incremental clustering stream
(VERDICT r6 #8): rows/s through streaming_phash_dup_clusters INCLUDING
its per-micro-batch iceberg-lite snapshot commits.

Synthesizes a deterministic (image_id, ts, phash) corpus (the same
splitmix64 phash family as the batch fixture: every 10th image gets a
hamming-1 variant), lands it as N_FILES parquet files, drains with
maxFilesPerTrigger=1 (one micro-batch per file, one snapshot commit
each) and reports wall + rows/s. One JSON line.

Usage: python scripts/bench_streaming.py [n_rows] [n_files]
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from equi7grid_spark.session import get_spark
    from equi7grid_spark.streaming.pipeline import streaming_phash_dup_clusters

    spark = get_spark(app_name="bench_streaming")
    work = Path(tempfile.mkdtemp(prefix="equi7_stream_bench_"))
    src = work / "stream_in"
    try:
        # deterministic corpus: splitmix64 phashes, every 10th image a
        # planted hamming-1 near-dup (star clusters, like the batch
        # fixture) — synthesized ONCE outside the timed window
        base = spark.range(n).select(
            F.concat(F.lit("img"), F.lpad(F.col("id").cast("string"), 12, "0")
                     ).alias("image_id"),
            F.timestamp_seconds(F.lit(1_767_225_600) + F.col("id") % 3600
                                ).alias("ts"),
            F.expr(
                "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10)"
                " AS BIGINT)"
            ).alias("phash"),
            F.col("id"),
        )
        v1 = base.filter(F.col("id") % 10 == 0).select(
            F.concat("image_id", F.lit("_v1")).alias("image_id"),
            "ts",
            F.expr("phash ^ shiftleft(1L, CAST(id % 59 AS INT))").alias(
                "phash"
            ),
            "id",
        )
        corpus = base.unionByName(v1).drop("id")
        corpus.repartition(n_files).write.mode("overwrite").parquet(str(src))
        n_rows = spark.read.parquet(str(src)).count()

        t0 = time.time()
        out = streaming_phash_dup_clusters(
            spark,
            str(src),
            str(work / "labels_tbl"),
            reader_options={"maxFilesPerTrigger": 1},
        )
        n_labeled = out.count()
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "metric": "streaming_phash_dup_clusters_throughput",
                    "rows": n_rows,
                    "micro_batches": n_files,
                    "labeled": n_labeled,
                    "wall_s": round(wall, 3),
                    "rows_per_sec": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
