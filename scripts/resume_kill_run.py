"""Resume-at-scale evidence run (VERDICT r4 #7): SIGKILL the 192M-row
flagship sink mid-write, resume, and verify committed subgrid
partitions are skipped and the final table equals an uninterrupted run.

Usage: python scripts/resume_kill_run.py [n_images]
Prints one JSON line; paste the result into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 192_000_000
IMAGES_PATH = f"/tmp/equi7_bench_images_{N_IMAGES}.parquet"
ROOT = "/tmp/equi7_resume_kill_tbl"
REF_ROOT = "/tmp/equi7_resume_ref_tbl"
JOB = str(Path(__file__).resolve().parents[1] / "equi7grid_spark/jobs/assign_and_join.py")


def ensure_images() -> None:
    os.environ.setdefault("BENCH_IMAGES_N", str(N_IMAGES))
    import bench

    bench.IMAGES_N = N_IMAGES
    bench.IMAGES_PATH = IMAGES_PATH
    bench.ensure_images()


def n_committed(root: str) -> int:
    cur = Path(root) / "_manifests" / "CURRENT"
    if not cur.exists():
        return 0
    try:
        m = json.loads((Path(root) / "_manifests" / cur.read_text().strip()).read_text())
        return len(m["partitions"])
    except (OSError, json.JSONDecodeError):  # mid-flip race
        return 0


def job_cmd(out_root: str) -> list[str]:
    return [
        sys.executable, JOB, "--input", IMAGES_PATH, "--output", out_root,
        "--incremental-commit",
    ]


def main() -> None:
    ensure_images()
    for d in (ROOT, REF_ROOT):
        shutil.rmtree(d, ignore_errors=True)

    # victim: SIGKILL the whole process group once >=3 subgrids committed
    victim = subprocess.Popen(
        job_cmd(ROOT), start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    t0 = time.time()
    killed_at = None
    while victim.poll() is None:
        n = n_committed(ROOT)
        if n >= 3:
            os.killpg(victim.pid, signal.SIGKILL)
            killed_at = n
            break
        if time.time() - t0 > 900:
            os.killpg(victim.pid, signal.SIGKILL)
            raise SystemExit("victim never reached 3 commits in 900s")
        time.sleep(0.2)
    victim.wait()
    if killed_at is None:
        raise SystemExit("victim finished before the kill — input too small")
    # Re-read AFTER the victim is dead: another per-subgrid commit can
    # land between the probe that read `killed_at` and SIGKILL delivery,
    # and the resume legitimately skips THAT count (ADVICE r5).
    committed_before = n_committed(ROOT)

    # resume to completion
    out = subprocess.run(job_cmd(ROOT), capture_output=True, text=True, check=True)
    stats = json.loads([ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1])

    # uninterrupted reference
    subprocess.run(job_cmd(REF_ROOT), capture_output=True, text=True, check=True)

    # compare committed table contents
    from equi7grid_spark.session import get_spark
    from equi7grid_spark.table.manifest import IcebergLiteTable

    spark = get_spark(app_name="resume_check", master="local[8]", shuffle_partitions=8)
    got = sorted(map(tuple, IcebergLiteTable(ROOT).read(spark).collect()))
    ref = sorted(map(tuple, IcebergLiteTable(REF_ROOT).read(spark).collect()))
    spark.stop()

    print(json.dumps({
        "n_images": N_IMAGES,
        "committed_before_kill": committed_before,
        "skipped_on_resume": stats["skipped_resume"],
        "rows_after_resume": len(got),
        "equals_uninterrupted": got == ref,
    }))
    sys.exit(0 if (got == ref and len(stats["skipped_resume"]) == committed_before) else 1)


if __name__ == "__main__":
    main()
