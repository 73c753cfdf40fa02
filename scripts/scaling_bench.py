"""Two-parallelism scaling benchmark (the north rule's N vs 4N check).

No real cluster exists in this sandbox, so the rule's two-cluster-size
criterion is evidenced by running the SAME job at local[N] and
local[4N] on the SAME input table and reporting throughput at both
plus scaling efficiency = (T_N / T_4N) / 4.

Method notes (both matter for an honest number):

* Levels default to 2 vs 8. This host's memory bandwidth saturates at
  ~8 JVM task threads (measured: identical shuffle stages burn ~6x
  more CPU-seconds at 32 threads than at 8), so 8->32 measures the
  machine's memory bus, not the engine's plan. 2->8 sits below the
  knee and isolates what the rule asks about: whether the PLAN scales
  (no serial stages, no skew, no driver bottleneck). On a real
  cluster, N->4N executors adds memory bandwidth with the cores —
  exactly what one box cannot emulate.
* The corpus is generated ONCE (at full parallelism) to a shared
  parquet table; each level reads the same files — datagen is not
  part of the job being measured, and the input is byte-identical.
* The job must be COMPUTE-DOMINATED to say anything about scaling:
  a local run carries ~15-20s of size-independent latency (stage
  scheduling, Python worker pool spin-up, CC convergence checks)
  that a 100-TB run amortizes to nothing. SCALE_ENTITIES controls
  the size; the parent also reports the Amdahl decomposition
  (serial_sec, parallel_sec) fitted from the two points.

Each level runs in its own subprocess (a JVM can't change master
in-process). The child also emits a checksum of the (file_id,
cluster_id) result so the parent can assert bit-identical clusters at
both parallelism levels — the determinism requirement behind the
scaling claim.

Usage:  python scripts/scaling_bench.py                  # both levels
        python scripts/scaling_bench.py --child N --input DIR
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ENTITIES = int(os.environ.get("SCALE_ENTITIES", "24000"))
HOT_FAMILY = int(os.environ.get("SCALE_HOT_FAMILY", "600"))


def generate_input(path: str) -> int:
    """Write the deterministic corpus once at full parallelism."""
    from blink_spark.corpus import generate_files
    from blink_spark.session import get_spark

    spark = get_spark("scaling-datagen")
    files = generate_files(
        spark, n_entities=N_ENTITIES, hot_family_size=HOT_FAMILY,
        partitions=max(32, N_ENTITIES // 2000),
    )
    files.write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


def run_child(cores: int, input_path: str) -> dict:
    from pyspark.sql import functions as F

    from blink_spark.pipeline import ERConfig, ERPipeline
    from blink_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", cores=cores)
    files = spark.read.parquet(input_path)
    n_files = files.count()

    pipe = ERPipeline(ERConfig())
    t0 = time.time()
    res = pipe.run(files)
    clusters = res.tables["s3_clusters"]
    n_scored = res.tables["s2_scores"].count()
    checksum = clusters.agg(
        F.coalesce(
            F.sum(F.xxhash64("file_id", "cluster_id").cast("decimal(38,0)")), F.lit(0)
        ).alias("h")
    ).collect()[0]["h"]
    wall = time.time() - t0
    stage_secs = {k: round(v, 2) for k, v in res.timings.items()}
    return {
        "cores": cores,
        "n_files": n_files,
        "scored_pairs": int(n_scored),
        "wall_sec": round(wall, 2),
        "pairs_per_sec": round(n_scored / wall, 1),
        "files_per_sec": round(n_files / wall, 1),
        "cluster_checksum": str(checksum),
        # materializing stages only (lazy stages roll into the next
        # spill); 'post' = CC + result counts/checksum after s2
        "stage_secs": stage_secs,
        "post_sec": round(wall - sum(stage_secs.values()), 2),
    }


def summarize(levels: tuple[int, int], results: dict) -> dict:
    n, n4 = levels
    t_n, t_4n = results[n]["wall_sec"], results[n4]["wall_sec"]
    factor = n4 / n
    eff = (t_n / t_4n) / factor
    # Amdahl fit from the two points: wall(c) = serial + parallel/c
    par = (t_n - t_4n) / (1.0 / n - 1.0 / n4)
    ser = max(0.0, t_n - par / n)
    identical = results[n]["cluster_checksum"] == results[n4]["cluster_checksum"]
    return {
        "levels": list(levels),
        "speedup": round(t_n / t_4n, 3),
        "scaling_efficiency": round(eff, 3),
        "clusters_identical": identical,
        "n_files": results[n]["n_files"],
        "scored_pairs": results[n]["scored_pairs"],
        "pairs_per_sec": {
            str(n): results[n]["pairs_per_sec"],
            str(n4): results[n4]["pairs_per_sec"],
        },
        "amdahl_serial_sec": round(ser, 2),
        "amdahl_parallel_sec": round(par, 2),
    }


def _calib_worker(_: int) -> float:
    """Fixed single-thread CPU+memory workload (same spirit as
    bench.calibrate_host): hash 256 MiB + interpreter loop."""
    import hashlib

    t0 = time.time()
    h = hashlib.sha256()
    blob = bytes(range(256)) * (1 << 18)
    for _ in range(4):
        h.update(blob)
    acc = 0
    for i in range(3_000_000):
        acc = (acc * 31 + i) & 0xFFFFFFFF
    return time.time() - t0


def hardware_ceiling(levels: tuple[int, int], trials: int = 3) -> dict:
    """What the MACHINE itself gives when N independent processes run
    the same fixed CPU workload concurrently — no Spark, no engine.
    On one box, per-core speed at N processes < at 1 process (turbo
    boost differential + shared memory bandwidth/LLC), so a perfectly
    parallel plan cannot reach N/1 speedup here; a real cluster adds
    those resources with every executor. machine_parallel_eff(L) =
    median t(1 proc) / median per-proc t(L procs); the plan-scaling
    number = raw efficiency / machine_parallel_eff(4N)/..(N)."""
    from concurrent.futures import ProcessPoolExecutor

    def level_time(nproc: int) -> float:
        times = []
        for _ in range(trials):
            with ProcessPoolExecutor(max_workers=nproc) as ex:
                per_proc = list(ex.map(_calib_worker, range(nproc)))
            times.append(sorted(per_proc)[len(per_proc) // 2])
        return sorted(times)[len(times) // 2]

    t = {lvl: round(level_time(lvl), 3) for lvl in sorted(set((1,) + tuple(levels)))}
    eff = {str(lvl): round(t[1] / t[lvl], 3) for lvl in t}
    return {"per_proc_sec": {str(k): v for k, v in t.items()},
            "machine_parallel_eff": eff}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--input", default=None)
    ap.add_argument("--levels", type=int, nargs=2, default=(2, 8))
    ap.add_argument("--keep-input", default=None,
                    help="reuse/retain this corpus dir instead of a temp one")
    ap.add_argument("--ceiling", action="store_true",
                    help="also measure the machine's no-Spark parallel ceiling")
    ap.add_argument("--pin", action="store_true",
                    help="bind each child's WHOLE process tree (JVM + "
                    "Arrow python workers) to exactly N cpus via taskset. "
                    "Without pinning, a local[1] child still overlaps its "
                    "task thread, GC, netty and python workers across free "
                    "cores (pipeline parallelism), so the '1-core' baseline "
                    "really consumes ~2 cores and deflates measured "
                    "efficiency; a real N-core executor has no such spare "
                    "cores. Pinned levels are the cluster-faithful reading.")
    args = ap.parse_args()

    if args.child is not None:
        print(json.dumps(run_child(args.child, args.input)))
        return 0

    input_path = args.keep_input or tempfile.mkdtemp(prefix="scale_corpus_")
    cleanup = args.keep_input is None
    try:
        if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
            n = generate_input(input_path)
            print(json.dumps({"generated_files": n, "input": input_path}))
        results = {}
        for cores in args.levels:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child", str(cores), "--input", input_path]
            if args.pin:
                # spread across the box instead of always cpus 0..N-1
                # (cpu0 also fields interrupts); stride keeps siblings
                # apart on SMT topologies
                ncpu = os.cpu_count() or cores
                if cores > ncpu:
                    raise SystemExit(
                        f"--pin: level {cores} exceeds the {ncpu} cpus "
                        "available — pinning would stack workers on "
                        "shared cores and record a spurious efficiency"
                    )
                stride = max(1, ncpu // cores)
                cpus = ",".join(str((i * stride) % ncpu)
                                for i in range(cores))
                cmd = ["taskset", "-c", cpus] + cmd
            out = subprocess.run(
                cmd,
                capture_output=True, text=True, timeout=3600,
            )
            line = out.stdout.strip().splitlines()[-1]
            results[cores] = json.loads(line)
            results[cores]["pinned"] = bool(args.pin)
            print(json.dumps(results[cores]))
        summary = summarize(tuple(args.levels), results)
        summary["pinned"] = bool(args.pin)
        if args.ceiling:
            ceil = hardware_ceiling(tuple(args.levels))
            summary["hardware_ceiling"] = ceil
            effs = ceil["machine_parallel_eff"]
            m = (
                float(effs[str(args.levels[1])])
                / float(effs[str(args.levels[0])])
            )
            summary["plan_efficiency_vs_machine_ceiling"] = round(
                summary["scaling_efficiency"] / m, 3
            ) if m else None
        print(json.dumps(summary))
        return 0 if (summary["clusters_identical"]
                     and summary["scaling_efficiency"] >= 0.8) else 1
    finally:
        if cleanup:
            shutil.rmtree(input_path, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
