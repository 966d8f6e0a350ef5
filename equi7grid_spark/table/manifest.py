"""Iceberg-lite table layer: snapshots, per-partition lineage, resume.

Real Iceberg jars are unavailable offline (SURVEY.md §7.0), so the
engine ships a thin snapshot/manifest layer over parquet with the same
operational contract the north rule demands: every run appends
per-partition lineage (partition key, row count, duration, input) to a
metrics table, commits are atomic (manifest written last), and a
restarted job anti-joins away already-committed partitions. Swapping
in real Iceberg later only replaces this module's IO.

Layout under <root>/:
  data/subgrid=<CC>/...parquet      partitioned data files
  _manifests/manifest-<id>.json     snapshot: committed partitions + stats
  _manifests/CURRENT                pointer to the live manifest
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IcebergLiteTable:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.manifest_dir = self.root / "_manifests"

    # -- manifest IO --------------------------------------------------
    def current_manifest(self) -> dict | None:
        cur = self.manifest_dir / "CURRENT"
        if not cur.exists():
            return None
        return json.loads((self.manifest_dir / cur.read_text().strip()).read_text())

    def committed_partitions(self) -> set[str]:
        m = self.current_manifest()
        if not m:
            return set()
        return {p["partition"] for p in m["partitions"]}

    def _commit(self, partitions: list[dict], meta: dict) -> dict:
        self.manifest_dir.mkdir(parents=True, exist_ok=True)
        prev = self.current_manifest()
        merged: dict[str, dict] = {}
        if prev:
            merged.update({p["partition"]: p for p in prev["partitions"]})
        merged.update({p["partition"]: p for p in partitions})
        snapshot_id = uuid.uuid4().hex[:16]
        manifest = {
            "snapshot_id": snapshot_id,
            "parent_id": prev["snapshot_id"] if prev else None,
            "committed_at_unix": time.time(),
            "meta": meta,
            "partitions": sorted(merged.values(), key=lambda p: p["partition"]),
            "total_rows": sum(p["rows"] for p in merged.values()),
        }
        name = f"manifest-{snapshot_id}.json"
        (self.manifest_dir / name).write_text(json.dumps(manifest, indent=1))
        # atomic-ish pointer flip (last step = the commit)
        tmp = self.manifest_dir / "CURRENT.tmp"
        tmp.write_text(name)
        tmp.replace(self.manifest_dir / "CURRENT")
        return manifest

    # -- write with lineage + resume ----------------------------------
    def write_partitioned(
        self,
        df: DataFrame,
        partition_col: str,
        *,
        meta: dict | None = None,
        resume: bool = True,
    ) -> dict:
        """Write `df` partitioned by `partition_col`; skip partitions the
        current manifest already committed (resume); record per-partition
        row counts + duration as lineage."""
        done = self.committed_partitions() if resume else set()
        if done:
            df = df.filter(~F.col(partition_col).isin(sorted(done)))
        t0 = time.time()
        # per-partition row counts (lineage) — one extra small agg job
        counts = {
            r[0]: r[1]
            for r in df.groupBy(partition_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if counts:
            (
                df.repartition(partition_col)
                .write.mode("append")
                .partitionBy(partition_col)
                .parquet(str(self.root / "data"))
            )
        dt = time.time() - t0
        parts = [
            {
                "partition": str(k),
                "rows": int(v),
                "seconds": round(dt, 3),
                "written_at_unix": time.time(),
            }
            for k, v in sorted(counts.items())
        ]
        manifest = self._commit(parts, meta or {})
        manifest["newly_written"] = sorted(counts)
        manifest["skipped_resume"] = sorted(done)
        return manifest

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(str(self.root / "data"))
