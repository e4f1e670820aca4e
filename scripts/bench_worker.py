"""One scaling-bench measurement: run the full linkage pipeline at a given
core count and print a JSON result line.

Spawned by bench_scaling.py once per parallelism level (a Spark local-mode
JVM cannot change its core count after start, so each level is its own
process — the sandbox stand-in for submitting the same job to an N- vs
4N-executor cluster).

Timing starts after the SparkSession is up and the input is on disk: it
measures the job, not JVM/infra startup, mirroring how cluster throughput
would be measured.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from translink.config import LinkConfig  # noqa: E402
from translink.pipeline import run_pipeline  # noqa: E402
from translink.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True, help="transcripts parquet dir")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    # Cluster-faithful memory: an N-executor cluster has N/4 the aggregate
    # memory of the 4N one (executors are fixed-size), so the JVM heap
    # scales with the level — 0.75 GB/core (6g at 8 cores, 24g at 32; the
    # 16-24g band measured healthy for G1 on this box, PLANS.md). A fixed
    # heap would hand the small level 4x the per-core memory (less spill,
    # fewer GCs) that no real N-executor cluster has; 0.625 GB/core proved
    # too tight (GCLocker allocation failures on repeat runs).
    os.environ.setdefault(
        "TRANSLINK_DRIVER_MEM", f"{max(4, (args.cores * 3) // 4)}g"
    )
    spark = get_spark(
        master=f"local[{args.cores}]",
        shuffle_partitions=4 * args.cores,
        app_name=f"translink-scaling-{args.cores}",
    )
    # stage checkpoints go to parquet (compressed, columnar, off-heap)
    # rather than heap-resident localCheckpoints — keeps GC pressure flat
    # across core counts; this is also the production (catalog) path.
    # TRANSLINK_BENCH_WORKBASE picks the medium (tmpfs vs disk A/B).
    workbase = os.environ.get("TRANSLINK_BENCH_WORKBASE", "/dev/shm")
    workdir = f"{workbase}/translink-work-{args.cores}"
    shutil.rmtree(workdir, ignore_errors=True)

    transcripts = spark.read.parquet(args.input)
    n_rows = transcripts.count()  # warms the scan; not part of the timing

    best = None
    for _ in range(args.repeat):
        shutil.rmtree(workdir, ignore_errors=True)
        t0 = time.time()
        result = run_pipeline(spark, transcripts, LinkConfig(), workdir=workdir)
        clusters = result["clusters"]
        agg = clusters.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.struct(*clusters.columns))).alias("checksum"),
        ).first()
        wall = time.time() - t0
        print("TIMINGS " + json.dumps(result["timings"]), flush=True)
        if best is None or wall < best["wall_s"]:
            best = {
                "cores": args.cores,
                "rows": n_rows,
                "clusters": int(agg["n"]),
                "checksum": int(agg["checksum"] or 0),
                "wall_s": round(wall, 3),
                "rows_per_s": round(n_rows / wall, 1),
                "timings": result["timings"],
            }
    print("RESULT " + json.dumps(best))


if __name__ == "__main__":
    main()
