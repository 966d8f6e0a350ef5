"""Round-7 optimization harness (NOT the driver's frozen bench.py).

Two jobs:
  --plans q1,q2,...  dump .explain("formatted") for each query to
                     plans/r07/<query>_<tag>.txt   (guide §7.2)
  --time q1,q2,...   per-query noop-sink wall times, min-of-N
                     (guide §1.4: noop computes every column, no sink
                     cost, no count()-style column pruning)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), REPS (default 3), TAG (default
     "before").
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "3"))
TAG = os.environ.get("TAG", "before")


def _session():
    from equi7grid_spark.session import get_spark

    return get_spark(
        app_name="equi7_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)
        },
    )


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2].split(",")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = _session()
    if mode == "--plans":
        outdir = Path(__file__).resolve().parent / "plans" / "r07"
        outdir.mkdir(parents=True, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (outdir / f"{name}_{TAG}.txt").write_text(plan)
            print(f"# wrote {name}_{TAG}.txt ({len(plan)} bytes)")
    elif mode == "--time":
        # warm both engines (mirrors bench.py's warmup)
        qs["tile_counts_t6"](spark, SF_DIR).count()
        qs["image_decode_stats"](spark, SF_DIR).count()
        out = {}
        for name in names:
            fn = qs[name]
            best = None
            for _ in range(REPS):
                spark.sparkContext.setJobDescription(f"time:{name}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
            print(f"# {name}: {best:.3f}s", file=sys.stderr)
        print(json.dumps(out))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
