"""Pinned memory-bandwidth ceiling probe (no Spark).

Measures steady-state per-process time for a STREAM-like numpy
workload (working set >> LLC) at 1/2/4/8 concurrent processes, each
taskset-pinned to its own cpu (same stride layout as
scaling_bench --pin). machine_parallel_eff(L) = t(1)/t(L): what the
MACHINE gives a perfectly parallel bandwidth-bound plan at L workers.
The ER job's s1 (Arrow minhash kernel) and s2 (codegen scoring) are
exactly this shape, so raw N->4N efficiency divided by this ceiling
isolates PLAN scaling from the host's shared memory bus — the thing a
real cluster adds with every executor and one box cannot.

Each worker allocates once, runs a warm-up pass (page faults, THP),
then times 6 streaming passes; the parent reports the median worker's
median pass at each level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def worker() -> None:
    import numpy as np

    a = np.arange(30_000_000, dtype=np.int64)  # 240 MB >> LLC
    b = np.empty_like(a)
    # warm-up: touch everything
    np.multiply(a, 3, out=b)
    times = []
    for _ in range(6):
        t0 = time.time()
        np.multiply(a, 31, out=b)
        np.bitwise_xor(b, 1469598103934665603, out=b)
        np.add(b, a, out=b)
        s = int(b[::4_000_000].sum())
        times.append(time.time() - t0)
    print(json.dumps({"median_pass_sec": sorted(times)[3], "sink": s}))


def level(nproc: int, trials: int = 3) -> float:
    ncpu = os.cpu_count() or nproc
    if nproc > ncpu:
        raise SystemExit(
            f"level {nproc} exceeds the {ncpu} cpus available — pinned "
            "workers would stack on shared cores and corrupt the ceiling"
        )
    stride = max(1, ncpu // nproc)
    meds = []
    for _ in range(trials):
        procs = []
        for i in range(nproc):
            cpu = (i * stride) % ncpu
            procs.append(subprocess.Popen(
                ["taskset", "-c", str(cpu), sys.executable,
                 os.path.abspath(__file__), "--worker"],
                stdout=subprocess.PIPE, text=True))
        per = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            per.append(json.loads(out.strip().splitlines()[-1])
                       ["median_pass_sec"])
        meds.append(sorted(per)[len(per) // 2])
    return sorted(meds)[len(meds) // 2]


def main() -> int:
    if "--worker" in sys.argv:
        worker()
        return 0
    t = {lvl: round(level(lvl), 4) for lvl in (1, 2, 4, 8)}
    eff = {str(k): round(t[1] / v, 3) for k, v in t.items()}
    print(json.dumps({"per_proc_pass_sec": {str(k): v for k, v in t.items()},
                      "machine_parallel_eff_bandwidth": eff}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
