"""Memory-bandwidth ceiling evidence for the scaling-efficiency analysis.

A single box shares ONE memory subsystem across all cores: the local[8]
level enjoys nearly the same aggregate DRAM bandwidth as local[32], while a
real 4N-executor cluster has 4x the memory channels of the N-executor one.
Any bandwidth-bound fraction of the job therefore shows sub-linear core
scaling HERE that would not exist on a real cluster. This script measures
that ceiling directly: a STREAM-triad-like numpy kernel (a[:] = b + s*c over
arrays far larger than LLC) run in P pinned worker processes, reporting
aggregate GB/s at P = 1, 8, 32.

Usage: python scripts/bench_membw.py [--sizemb 512] [--reps 6]
Writes its table into BENCH/MEMBW.json for BENCH/BASELINE.md to cite.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _worker(size_mb: int, reps: int, cpu: int, q) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    n = size_mb * 1024 * 1024 // 8
    a = np.zeros(n)
    b = np.random.default_rng(cpu).random(n)
    c = np.random.default_rng(cpu + 1).random(n)
    # warm-up pass (page faults)
    np.add(b, 3.0 * c, out=a)
    t0 = time.time()
    for _ in range(reps):
        np.add(b, 3.0 * c, out=a)  # triad: 3 arrays touched per pass
    dt = time.time() - t0
    q.put(3 * 8 * n * reps / dt)  # bytes moved / sec for this worker


def measure(n_workers: int, size_mb: int, reps: int) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(size_mb, reps, i, q))
        for i in range(n_workers)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    # aggregate: total bytes / max wall (workers run concurrently)
    total_bytes = 3 * 8 * (size_mb * 1024 * 1024 // 8) * reps * n_workers
    return total_bytes / wall / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizemb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    out = {}
    for p in (1, 8, 32):
        gbs = measure(p, args.sizemb, args.reps)
        out[str(p)] = round(gbs, 1)
        print(f"{p:>3} workers: {gbs:8.1f} GB/s aggregate")
    out["scaling_8_to_32"] = round(out["32"] / out["8"], 2)
    print(f"8 -> 32 worker bandwidth scaling: {out['scaling_8_to_32']}x "
          f"(4.0x would be bandwidth-unconstrained)")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "MEMBW.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
