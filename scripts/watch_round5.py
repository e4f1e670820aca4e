"""Round-5 healthy-window orchestrator: headline re-pin FIRST, then sweep.

Same inverted gating as watch_scaling.py (probe cheaply, launch only into
a healthy window), but a window is spent in priority order: (1) the
bracketed sf0.1 headline bench — the r3-comparable re-pin VERDICT r4 asks
for first — costs ~6 min; (2) if the window still holds afterwards
(re-probe >= --sweep-threshold), the 3-level 53M-row scaling sweep.
A window wide enough for only the headline still closes the higher-value
item; the sweep keeps its own per-leg admission gates regardless.

Usage: python scripts/watch_round5.py [--threshold 2.5] [--max-hours 4]
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
    ap.add_argument("--threshold", type=float, default=2.5)
    ap.add_argument("--sweep-threshold", type=float, default=2.0)
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--interval-s", type=int, default=480)
    ap.add_argument("--log", default=os.path.join(REPO, "BENCH",
                                                  "watch_scaling.log"))
    args = ap.parse_args()

    t0 = time.time()
    headline_done = False
    with open(args.log, "a") as log:
        def note(msg: str) -> None:
            stamp = datetime.datetime.now().strftime("%H:%M:%S")
            print(f"[{stamp}] {msg}", flush=True)
            log.write(f"[{datetime.datetime.now().isoformat()}] r5: {msg}\n")
            log.flush()

        note(f"r5 watch start: headline-then-sweep, threshold="
             f"{args.threshold} GB/s at 8w, max {args.max_hours}h")
        while time.time() - t0 < args.max_hours * 3600:
            gbps = round(measure(8, 128, 2), 1)
            note(f"probe: 8w = {gbps} GB/s")
            if gbps >= args.threshold:
                if not headline_done:
                    note(f"window OPEN ({gbps}) — headline re-pin first")
                    rc = subprocess.call(
                        [sys.executable, os.path.join(REPO, "bench.py")],
                        cwd=REPO,
                    )
                    note(f"headline finished rc={rc} "
                         f"(brackets in BENCH/HEADLINE_latest.json)")
                    headline_done = rc == 0
                    continue  # re-probe before spending the window further
                if gbps >= args.sweep_threshold:
                    out = os.path.join(REPO, "BENCH", "SCALING_r05_watch.json")
                    note(f"window still open ({gbps}) — launching sweep")
                    rc = subprocess.call([
                        sys.executable,
                        os.path.join(REPO, "scripts", "bench_scaling.py"),
                        "--levels", "8,16,32", "--interleave", "1",
                        "--min-membw", "2.0", "--max-wait-s", "900",
                        "--json-out", out, "--no-md",
                    ], cwd=REPO)
                    note(f"sweep finished rc={rc}")
                    return
            time.sleep(args.interval_s)
        note("r5 watch expired: "
             + ("headline re-pinned, sweep window never held"
                if headline_done else "no healthy window opened; nothing ran"))


if __name__ == "__main__":
    main()
