"""Weather watcher for the 3-level scaling sweep.

The shared host's DRAM bandwidth oscillates ~10x between hours
(BENCH/MEMBW_*.json); a sweep launched into a bad window wastes ~1h of
legs and produces a discarded artifact (three such post-mortems in
BENCH/BASELINE.md). This watcher inverts the gating: probe cheaply every
few minutes and only START the sweep when the 8-worker STREAM stamp
clears the healthy threshold — if the window never opens, nothing runs
and the probe log is the evidence.

Usage: python scripts/watch_scaling.py [--threshold 2.5] [--max-hours 4]
       [--interval-s 480] [--json-out BENCH/SCALING_xxx.json]
"""

from __future__ import annotations

import argparse
import datetime
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.bench_membw import measure  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=2.5,
                    help="8-worker GB/s stamp that opens the launch window "
                         "(healthy-day standing stamp: 2.6-2.7)")
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--interval-s", type=int, default=480)
    ap.add_argument("--levels", default="8,16,32")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--log", default=os.path.join(REPO, "BENCH",
                                                  "watch_scaling.log"))
    args = ap.parse_args()

    out = args.json_out or os.path.join(
        REPO, "BENCH",
        f"SCALING_watch_{datetime.date.today().strftime('%Y%m%d')}.json",
    )
    t0 = time.time()
    with open(args.log, "a") as log:
        def note(msg: str) -> None:
            stamp = datetime.datetime.now().strftime("%H:%M:%S")
            print(f"[{stamp}] {msg}", flush=True)
            log.write(f"[{datetime.datetime.now().isoformat()}] {msg}\n")
            log.flush()

        note(f"watch start: threshold={args.threshold} GB/s at 8w, "
             f"max {args.max_hours}h, probing every {args.interval_s}s")
        while time.time() - t0 < args.max_hours * 3600:
            gbps = round(measure(8, 128, 2), 1)
            note(f"probe: 8w = {gbps} GB/s")
            if gbps >= args.threshold:
                note(f"window OPEN ({gbps} >= {args.threshold}) — "
                     f"launching sweep -> {out}")
                rc = subprocess.call([
                    sys.executable, os.path.join(REPO, "scripts",
                                                 "bench_scaling.py"),
                    "--levels", args.levels,
                    "--interleave", "1",
                    "--min-membw", "2.0",
                    "--max-wait-s", "900",
                    "--json-out", out,
                    "--no-md",
                ], cwd=REPO)
                note(f"sweep finished rc={rc}")
                return
            time.sleep(args.interval_s)
        note("watch expired: no healthy window opened; nothing ran")


if __name__ == "__main__":
    main()
