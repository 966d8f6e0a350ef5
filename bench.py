"""Benchmark harness: headline queries + N→4N scaling efficiency.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline seconds>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "images_per_sec_local8": ...,
   "images_per_sec_local32": ..., "scaling_efficiency_8_to_32": ...}

Scaling protocol (sandbox proxy for the north rule's N→4N executor
gate, see BASELINE.md and BENCH/BASELINE.md): the SAME flagship job —
read images parquet → zone PIP → AEQD forward → T6 tile keys →
broadcast catalog join → per-tile counts — runs in subprocesses pinned
with `taskset` to N and then 4N cores, on the SAME input. Pinning is
essential for honesty in local mode: python UDF workers are separate
processes, so an unpinned local[N] silently uses ~2N cores and
understates scaling. Efficiency = throughput(4N) / (4 × throughput(N)).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_SCALE_N (default 4 → pair 4 vs 16),
     BENCH_IMAGES_N (default 48_000_000).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Scaling pair: N and 4N cores (driver instruction allows any N).
# 3 vs 12 keeps the 4N side well under the host's sustained-load
# CPU-steal threshold (10-25% steal at high busy-core counts on this
# VM), and 192M rows amortize the fixed job cost (~2-3s of scheduling,
# scan ramp-up and final collect) to <15% of the 4N-side run.
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "3"))
IMAGES_N = int(os.environ.get("BENCH_IMAGES_N", "192000000"))
# File count of the scaling fixture. Scan-partition SIZE is governed by
# spark.sql.files.maxPartitionBytes (BENCH_MAX_PARTITION_BYTES), but a
# scan partition never spans files — so the 10x-partition sf1-shape
# scaling point needs BOTH fewer/larger files (BENCH_IMAGES_PARTS=32 →
# ~290 MB files at 192M rows) and a 10x maxPartitionBytes (160 MB).
IMAGES_PARTS = int(os.environ.get("BENCH_IMAGES_PARTS", str(4 * CPUS)))
IMAGES_PATH = f"/tmp/equi7_bench_images_{IMAGES_N}_{IMAGES_PARTS}.parquet"

HEADLINE = [
    "tile_assign_t6_counts",   # geodesic flagship on sf tables
    "tile_roundtrip_t6_counts",  # fwd -> Column inverse -> fwd closure
    "tile_counts_t6",          # arithmetic tiling + agg
    "tile_rollup_counts",      # T1->T3->T6 multi-resolution rollup (r5)
    "tilename_format",
    "bbox_range_join",
    "knn_tiles",
    "dedup_exact",
    "dedup_minhash_lsh",
    "doc_fingerprint",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "events_windowed",
    "roi_search_global_t6",
    "warp_raster_to_tiles",
    "image_decode_stats",
    "image_phash_near_dup",    # banded hamming join (graft flagship op)
    "image_phash_pipeline",    # decode -> DCT phash -> banded join
    "image_multimodal_near_dup",  # phash OR caption cross-signal dedup
    "image_multimodal_embed_near_dup",  # + embedding LSH signal (r5)
    "image_phash_dup_clusters",  # iterative min-label closure (r5)
    "zone_assign_buffered_counts",  # buffered-membership pandas PIP (r6)
    "audio_stats",             # audio modality decode->stats (r6)
]


MAX_PARTITION_BYTES = int(
    os.environ.get("BENCH_MAX_PARTITION_BYTES", str(16 * 1024 * 1024))
)


def _session(n_threads: int, app: str):
    from equi7grid_spark.session import get_spark

    return get_spark(
        app_name=app,
        master=f"local[{n_threads}]",
        shuffle_partitions=2 * n_threads,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(MAX_PARTITION_BYTES)},
    )


def ensure_images() -> None:
    if Path(IMAGES_PATH).exists():
        return
    spark = _session(CPUS, "equi7_bench_datagen")
    from equi7grid_spark.images import synthetic_images

    t0 = time.time()
    df = synthetic_images(spark, IMAGES_N, with_bytes=False, partitions=IMAGES_PARTS)
    df.write.mode("overwrite").parquet(IMAGES_PATH)
    print(f"# generated {IMAGES_N} images in {time.time()-t0:.1f}s", file=sys.stderr)
    spark.stop()


def flagship_run(n_threads: int) -> None:
    """Subprocess entry: warmup + best-of-2 flagship, one JSON line."""
    spark = _session(n_threads, f"equi7_flagship_{n_threads}")
    from pyspark.sql import functions as F

    from equi7grid_spark.jobs.assign_and_join import run
    from equi7grid_spark.operators.assign_jvm import tile_counts_jvm

    df = spark.read.parquet(IMAGES_PATH)
    # warm the JVM path: broadcast map conversion, codegen, kernel JIT
    warm = tile_counts_jvm(df.limit(100_000).repartition(2 * n_threads))
    warm.agg(F.count(F.lit(1))).collect()

    # min-of-2 timed runs per subprocess, SYMMETRIC on both sides of
    # the pair (picking the less CPU-stolen run per side is standard
    # min-of-N methodology and does not bias the ratio); cross-run
    # drift is handled by pairing near-in-time (N, 4N) rounds and
    # taking the median over rounds. Steal is measured around the
    # TIMED runs only — the JVM-boot/warmup prefix would otherwise
    # dilute an epoch that hit the measurement window.
    best = None
    s0, t0 = _cpu_ticks(n_threads)
    for _ in range(2):
        stats = run(spark, IMAGES_PATH, "T6", None)
        if best is None or stats["seconds"] < best["seconds"]:
            best = stats
    s1, t1 = _cpu_ticks(n_threads)
    best["steal_frac"] = round((s1 - s0) / max(1, t1 - t0), 4)
    print(json.dumps(best))
    spark.stop()


def _flagship_subprocess(n: int) -> dict:
    cmd = [sys.executable, __file__, "--flagship-threads", str(n)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{n-1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def _cpu_ticks(n: int) -> tuple[int, int]:
    """(steal_ticks, total_ticks) summed over cpus 0..n-1 (the pinned
    range) from /proc/stat."""
    steal = total = 0
    for ln in Path("/proc/stat").read_text().splitlines():
        if ln.startswith("cpu") and ln[3:4].isdigit():
            parts = ln.split()
            if int(parts[0][3:]) < n:
                vals = [int(v) for v in parts[1:9]]
                steal += vals[7]
                total += sum(vals)
    return steal, total


STEAL_MAX = float(os.environ.get("BENCH_STEAL_MAX", "0.04"))
# The scaling pair is the driver's only numeric gate and a 3% steal
# epoch on the 3-core side alone moves a pair by ~0.1 (r4: pairs
# 0.754/0.895/0.972 with two sides accepted at 2.3-3.2% steal, r4
# VERDICT #1) — so scaling-side acceptance is much stricter than the
# headline queries' 4%.
SCALING_STEAL_MAX = float(os.environ.get("BENCH_SCALING_STEAL_MAX", "0.015"))
SCALING_ROUNDS = int(os.environ.get("BENCH_SCALING_ROUNDS", "5"))


def _measured_run(n: int) -> tuple[dict, float]:
    """One pinned flagship subprocess + the steal fraction its pinned
    cpus suffered during the TIMED window (the subprocess measures it
    around its best-of-2 runs, excluding JVM boot/warmup; fall back to
    a parent-side whole-lifetime measurement if absent)."""
    s0, t0 = _cpu_ticks(n)
    stats = _flagship_subprocess(n)
    s1, t1 = _cpu_ticks(n)
    outer = (s1 - s0) / max(1, t1 - t0)
    return stats, stats.get("steal_frac", outer)


# The wide (4N-core) side has a BIMODAL slow mode INVISIBLE to the
# steal filter: identical pinned 12-core runs measured 95.6s vs 139.9s
# at <=0.2% steal (BENCH/BASELINE.md r5) — host memory-bandwidth
# contention that only the bandwidth-bound side feels. Its signature
# is a wall >25% over the session's best wall AT THE SAME core count,
# so any attempt over that ratio is re-run like an over-steal attempt
# (VERDICT r5 #4).
SLOW_MODE_WALL_RATIO = float(os.environ.get("BENCH_SLOW_MODE_RATIO", "1.25"))


def measure_scaling(rounds: int = SCALING_ROUNDS, max_extra: int = 4) -> dict:
    """Steal- and slow-mode-filtered median-of-paired-rounds estimator.

    This VM suffers hypervisor CPU-steal epochs lasting minutes
    (observed: the same pinned 12-core job at 27.5s → 36.0s → 44.5s
    across one otherwise-idle bench run). Wall-clock under steal
    measures the hypervisor, not the engine, and a stolen epoch biases
    the ratio in EITHER direction depending on which side it hits. So
    each pinned run also measures the steal fraction its cpus suffered
    (/proc/stat delta); a side whose steal exceeds SCALING_STEAL_MAX
    (default 1.5% — far stricter than the headline queries' 4%,
    because a 3% epoch on the small side alone moves a pair by ~0.1)
    is re-run (bounded by `max_extra` extra subprocesses per side).
    A second filter catches the steal-invisible BIMODAL slow mode
    (SLOW_MODE_WALL_RATIO): an attempt whose wall exceeds the
    session's best wall at the same core count by >25% re-runs under
    the same budget. The reported efficiency is the median over
    `rounds` (default 5) near-in-time (4N, N) pairs; every attempt's
    steal fraction is recorded, and each pair carries its accepted
    steal fractions, its wall-vs-session-best ratios and its rerun
    count, so a sub-0.8 pair is auditable against steal AND slow-mode
    readings instead of reading as an engine regression."""
    ensure_images()
    effs, best, steals, pair_details = [], {}, [], []
    session_best_wall: dict[int, float] = {}
    for r in range(rounds):
        pair, pair_steal, pair_wall, pair_over = {}, {}, {}, False
        pair_reruns = 0
        for n in (4 * SCALE_N, SCALE_N):
            retries = 0  # budget is per side, per the docstring
            # on retry exhaustion accept the best attempt seen — prefer
            # under-cap steal, then the FASTEST wall (a retry loop that
            # ends inside a steal epoch or a slow-mode window must not
            # discard an earlier clean measurement)
            side_best = None  # (over_cap, wall, steal, stats, rps)
            while True:
                time.sleep(15)
                stats, steal = _measured_run(n)
                wall = stats["seconds"]
                rps = stats["images"] / wall
                print(
                    f"# round {r}: local[{n}] pinned {stats['images']} imgs "
                    f"in {wall}s = {rps:,.0f} img/s "
                    f"(steal {steal:.1%})",
                    file=sys.stderr,
                )
                steals.append(round(steal, 4))  # every attempt, for audit
                floor = session_best_wall.get(n)
                session_best_wall[n] = wall if floor is None else min(floor, wall)
                key = (steal > SCALING_STEAL_MAX, wall)
                if side_best is None or key < (side_best[0], side_best[1]):
                    side_best = (key[0], wall, steal, stats, rps)
                slow_mode = (
                    floor is not None and wall > floor * SLOW_MODE_WALL_RATIO
                )
                if steal <= SCALING_STEAL_MAX and not slow_mode:
                    break
                if retries >= max_extra:
                    _, wall, steal, stats, rps = side_best
                    pair_over = pair_over or steal > SCALING_STEAL_MAX
                    print(
                        f"# round {r}: retries exhausted, keeping best "
                        f"attempt (steal {steal:.1%}, wall {wall}s)",
                        file=sys.stderr,
                    )
                    break
                retries += 1
                pair_reruns += 1
                why = "slow-mode wall" if slow_mode else "steal too high"
                print(f"# round {r}: {why}, re-running", file=sys.stderr)
                # steal epochs last minutes — escalate the wait so the
                # later retries can actually outlive one
                time.sleep(45 * retries)
            pair[n] = rps
            pair_steal[n] = round(steal, 4)
            pair_wall[n] = wall
            cur = best.get(n)
            if cur is None or rps > cur["rows_per_sec"]:
                best[n] = {
                    "seconds": stats["seconds"],
                    "rows": stats["images"],
                    "rows_per_sec": round(rps, 1),
                }
        eff = pair[4 * SCALE_N] / (4.0 * pair[SCALE_N])
        effs.append(eff)
        pair_details.append({
            "efficiency": round(eff, 3),
            f"steal_{4*SCALE_N}c": pair_steal[4 * SCALE_N],
            f"steal_{SCALE_N}c": pair_steal[SCALE_N],
            f"wall_{4*SCALE_N}c": pair_wall[4 * SCALE_N],
            f"wall_{SCALE_N}c": pair_wall[SCALE_N],
            "reruns": pair_reruns,
            "over_cap": pair_over,
        })
        print(f"# round {r}: pair efficiency {eff:.3f}", file=sys.stderr)
    # retrospective slow-mode annotation: each accepted wall vs the
    # SESSION-FINAL best wall at its core count (the prospective guard
    # can only compare against the best seen SO FAR — round 0 has no
    # floor, so its ratio is only knowable here)
    for d in pair_details:
        for n in (4 * SCALE_N, SCALE_N):
            d[f"wall_ratio_{n}c"] = round(
                d[f"wall_{n}c"] / session_best_wall[n], 3
            )
    effs.sort()
    res = {f"local{n}": v for n, v in best.items()}
    res["pair_efficiencies"] = [round(e, 3) for e in effs]
    res["scaling_efficiency"] = round(effs[len(effs) // 2], 3)
    res["scaling_efficiency_min"] = round(effs[0], 3)
    res["scaling_efficiency_max"] = round(effs[-1], 3)
    res["pair_details"] = pair_details
    res["scaling_steal_cap"] = SCALING_STEAL_MAX
    res["slow_mode_wall_ratio"] = SLOW_MODE_WALL_RATIO
    res["steal_fracs"] = steals
    return res


def run_headline(spark) -> tuple[dict[str, float], dict[str, float]]:
    """Per-query timings + per-query steal fractions.

    Round-2 lesson: a single whole-pass steal number (3.9% that round)
    made per-query r1/r2 comparisons unreadable — a steal epoch hitting
    one query reads as a regression of THAT query. So steal is now
    measured around each query's min-of-2 window, and a query whose
    window was stolen above BENCH_STEAL_MAX is re-run (bounded, with
    escalating backoff — epochs last minutes, so a fixed 30s wait could
    land every retry inside the same epoch). A query whose FINAL
    accepted window still exceeded the threshold is listed in the
    output's queries_over_steal so downstream round-over-round
    comparisons can exclude it instead of reading it as a regression."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warm both engines once so no query is charged for startup:
    # tile_counts_t6 warms the JVM/codegen side, image_decode_stats
    # forks the python workers (the flagship no longer uses any)
    qs["tile_counts_t6"](spark, SF_DIR).count()
    qs["image_decode_stats"](spark, SF_DIR).count()
    times, qsteals = {}, {}
    for name in HEADLINE:
        fn = qs[name]
        best = steal = None
        n = 0
        for attempt in range(3):
            s0, t0 = _cpu_ticks(CPUS)
            best = None
            for _ in range(2):  # min-of-2 absorbs sub-window spikes
                t0w = time.time()
                n = fn(spark, SF_DIR).count()
                dt = time.time() - t0w
                best = dt if best is None else min(best, dt)
            s1, t1 = _cpu_ticks(CPUS)
            steal = (s1 - s0) / max(1, t1 - t0)
            if steal <= STEAL_MAX or attempt == 2:
                break
            print(
                f"# {name}: steal {steal:.1%} > {STEAL_MAX:.0%}, re-running",
                file=sys.stderr,
            )
            time.sleep(30 * (attempt + 1))
        times[name] = round(best, 3)
        qsteals[name] = round(steal, 4)
        print(
            f"# {name}: {n} rows in {times[name]}s (steal {steal:.1%})",
            file=sys.stderr,
        )
    return times, qsteals


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--flagship-threads":
        flagship_run(int(sys.argv[2]))
        return

    # --scaling-only: just the pinned scaling pairs, one JSON line —
    # for extra scale points (e.g. the 10x-partition sf1-shape run:
    # BENCH_IMAGES_PARTS=32 BENCH_MAX_PARTITION_BYTES=167772160) where
    # the headline is already measured elsewhere
    if "--scaling-only" in sys.argv[1:]:
        scaling = measure_scaling()
        scaling.update({
            "metric": "scaling_only",
            "images_n": IMAGES_N,
            "images_parts": IMAGES_PARTS,
            "max_partition_bytes": MAX_PARTITION_BYTES,
            "scaling_pair": [SCALE_N, 4 * SCALE_N],
        })
        print(json.dumps(scaling))
        return

    # BENCH_HEADLINE_ONLY=1 skips the pinned scaling pairs — for extra
    # sf points (e.g. the sf1 run) where scaling is sf-independent and
    # already measured by the main run
    headline_only = os.environ.get("BENCH_HEADLINE_ONLY", "") == "1"
    scaling = None if headline_only else measure_scaling()

    time.sleep(15)  # settle after the pinned scaling runs
    spark = _session(CPUS, "equi7_bench_headline")
    s0, t0 = _cpu_ticks(CPUS)
    qtimes, qsteals = run_headline(spark)
    s1, t1 = _cpu_ticks(CPUS)
    headline_steal = round((s1 - s0) / max(1, t1 - t0), 4)
    spark.stop()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_total_seconds (equi7 tile-assignment engine)",
        "value": round(sum(qtimes.values()), 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "images_n": IMAGES_N,
    }
    if scaling is not None:
        out.update({
            f"images_per_sec_local{SCALE_N}": scaling[f"local{SCALE_N}"]["rows_per_sec"],
            f"images_per_sec_local{4*SCALE_N}": scaling[f"local{4*SCALE_N}"]["rows_per_sec"],
            "scaling_pair": [SCALE_N, 4 * SCALE_N],
            "scaling_pair_efficiencies": scaling["pair_efficiencies"],
            "scaling_efficiency_n_to_4n": scaling["scaling_efficiency"],
            "scaling_efficiency_min": scaling["scaling_efficiency_min"],
            "scaling_efficiency_max": scaling["scaling_efficiency_max"],
            "scaling_pair_details": scaling["pair_details"],
            "scaling_steal_cap": scaling["scaling_steal_cap"],
            "scaling_run_steal_fracs": scaling["steal_fracs"],
        })
    out.update({
        "headline_steal_frac": headline_steal,
        "queries_steal_fracs": qsteals,
        "queries_over_steal": sorted(
            n for n, s in qsteals.items() if s > STEAL_MAX
        ),
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
