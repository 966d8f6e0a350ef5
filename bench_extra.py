"""Round-7 optimization harness (NOT the driver's frozen bench.py).

Three jobs:
  --plans q1,q2,...  dump .explain("formatted") for each query to
                     plans/r07/<query>_<tag>.txt   (guide §7.2)
  --time q1,q2,...   per-query noop-sink wall times, min-of-N
                     (guide §1.4: noop computes every column, no sink
                     cost, no count()-style column pruning)
  --ab q1,q2,...     ORDER-BALANCED same-session A/B of the runtime SQL
                     confs in AB_CONF ("k=v;k=v", the ON variant; OFF
                     restores the session values). The variant order
                     flips every rep: the second consecutive invocation
                     of the SAME query runs 10-30% faster than the
                     first (codegen/JIT/page-cache adjacency — CLAUDE.md
                     r7), so a fixed [A,B] interleave systematically
                     flatters B and measured a 10-30% "win" for a
                     config pair that balanced ordering showed to be a
                     no-op. Use count() actions (driver methodology).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), REPS (default 3; use >=8 for --ab),
     TAG (default "before"), AB_CONF (for --ab).
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
    elif mode == "--ab":
        conf = os.environ.get("AB_CONF", "")
        if not conf:
            raise SystemExit("--ab needs AB_CONF='key=value;key=value'")
        on_conf = dict(kv.split("=", 1) for kv in conf.split(";") if kv)
        off_conf = {k: spark.conf.get(k) for k in on_conf}
        qs["tile_counts_t6"](spark, SF_DIR).count()
        qs["image_decode_stats"](spark, SF_DIR).count()
        res = {n: {False: [], True: []} for n in names}
        for rep in range(max(REPS, 2)):
            order = (False, True) if rep % 2 == 0 else (True, False)
            for name in names:
                for on in order:
                    for k, v in (on_conf if on else off_conf).items():
                        spark.conf.set(k, v)
                    spark.sparkContext.setJobDescription(
                        f"ab:{name}:{'on' if on else 'off'}"
                    )
                    t0 = time.time()
                    qs[name](spark, SF_DIR).count()
                    res[name][on].append(time.time() - t0)
            print(f"# rep {rep} done", file=sys.stderr)
        out = {}
        for name in names:
            a = sorted(res[name][False])
            b = sorted(res[name][True])
            out[name] = {
                "off_min": round(a[0], 3),
                "off_med": round(a[len(a) // 2], 3),
                "on_min": round(b[0], 3),
                "on_med": round(b[len(b) // 2], 3),
            }
            print(f"# {name}: OFF min {a[0]:.3f} med {a[len(a)//2]:.3f} | "
                  f"ON min {b[0]:.3f} med {b[len(b)//2]:.3f}", file=sys.stderr)
        print(json.dumps(out))
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
