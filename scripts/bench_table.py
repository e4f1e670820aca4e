"""Round-over-round bench table FROM ARTIFACT FILES (never from memory).

Reads every BENCH_r{n}.json (driver capture) and BENCH/HEADLINE_r{n}.json
(builder close-out) in the repo and prints one markdown table of per-query
walls across rounds, using the intersection-friendly union of query names.
Rounds whose driver capture was unparseable simply have no column — the
gaps are visible, not papered over.

Usage: python scripts/bench_table.py [--queries q1,q2,...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> dict[str, dict]:
    """-> {column_label: {"value": total, "queries": {...}}} sorted by round."""
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r0*.json"))):
        n = re.search(r"BENCH_r(\d+)", path).group(1)
        try:
            d = json.load(open(path))
        except Exception:
            continue
        # driver capture wraps the bench stdout: {"parsed": {...}} when the
        # tail was parseable, {"parsed": null} when truncated (round 3)
        if isinstance(d, dict) and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        if isinstance(d, dict) and isinstance(d.get("queries"), dict):
            out[f"r{int(n)} driver"] = d
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH", "HEADLINE_r0*.json"))):
        n = re.search(r"HEADLINE_r(\d+)", path).group(1)
        try:
            d = json.load(open(path))
        except Exception:
            continue
        if isinstance(d, dict) and isinstance(d.get("queries"), dict):
            out[f"r{int(n)} builder"] = d
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: union, sorted by "
                         "latest-round wall descending)")
    args = ap.parse_args()

    rounds = load_rounds()
    if not rounds:
        raise SystemExit("no parseable bench artifacts found")
    cols = list(rounds)
    if args.queries:
        names = args.queries.split(",")
    else:
        last = rounds[cols[-1]]["queries"]
        union: set[str] = set()
        for d in rounds.values():
            union.update(d["queries"])
        names = sorted(union, key=lambda q: -last.get(q, -1.0))

    print("| query | " + " | ".join(f"{c} (s)" for c in cols) + " |")
    print("|---|" + "---|" * len(cols))
    for q in names:
        cells = [
            f"{rounds[c]['queries'][q]:.1f}" if q in rounds[c]["queries"]
            else "—"
            for c in cols
        ]
        print(f"| {q} | " + " | ".join(cells) + " |")
    totals = [f"{rounds[c].get('value', float('nan')):.1f}" for c in cols]
    print("| **total** | " + " | ".join(totals) + " |")

    # Weather-stamp row + comparability verdicts: a column pair whose DRAM
    # bracket stamps disagree by >2x measured different machines in effect
    # (host-weather memory discipline) — per-query deltas between them are
    # NOT evidence of a code regression. Runs bracketed (membw_stamps) use
    # their min stamp, the conservative ceiling the run actually saw.
    def stamp(d: dict) -> float | None:
        br = d.get("membw_stamps")
        if isinstance(br, dict):
            vals = [v for v in br.values() if isinstance(v, (int, float)) and v > 0]
            if vals:
                return min(vals)
        v = d.get("membw_8w_gbps")
        return v if isinstance(v, (int, float)) and v > 0 else None

    stamps = {c: stamp(rounds[c]) for c in cols}
    cells = [f"{stamps[c]:.2f}" if stamps[c] else "—" for c in cols]
    print("| _membw GB/s_ | " + " | ".join(cells) + " |")
    spreads = [
        f"{rounds[c]['membw_spread']:.2f}"
        if isinstance(rounds[c].get("membw_spread"), (int, float))
        and rounds[c]["membw_spread"] > 0 else "—"
        for c in cols
    ]
    print("| _bracket spread_ | " + " | ".join(spreads) + " |")
    bad = [
        (a, b)
        for i, a in enumerate(cols) for b in cols[i + 1:]
        if stamps[a] and stamps[b]
        and max(stamps[a], stamps[b]) / min(stamps[a], stamps[b]) > 2.0
    ]
    for a, b in bad:
        print(f"\n> NOT COMPARABLE: {a} ({stamps[a]:.2f} GB/s) vs {b} "
              f"({stamps[b]:.2f} GB/s) — bracket stamps differ >2x; "
              f"per-query deltas reflect host weather, not code.")


if __name__ == "__main__":
    main()
