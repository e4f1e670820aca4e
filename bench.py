#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is materialized with a full-row checksum aggregate
(bit_xor(xxhash64(struct(*)))) so Catalyst cannot prune the expensive
columns a bare count() would skip.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from translink.session import get_spark  # noqa: E402

#: Headline operators benchmarked per round. Names match queries() entries
#: (plus the full pipeline, which subsumes canonicalize/signatures/blocking/
#: scoring/clustering end to end).
BENCH_QUERIES = [
    "pipeline_clusters_full",
    "exact_dup_clusters",
    "candidate_pairs",
    "pair_scores",
    "doc_minhash_lsh_pairs",
    "doc_jaccard_pairs",
    "doc_jaccard_pairs_fast",
    "doc_simhash_pairs",
    "doc_entropy",
    "doc_entropy_fast",
    "doc_char_crossent_fast",
    "doc_char_histogram",
    "doc_stat_sim_pairs_fast",
    "doc_decontam_fast",
    "doc_containment_pairs_fast",
    "dedup_keep_list",
    "ann_cosine_topk",
    "ann_cosine_topk_lsh",
    "ann_cosine_topk_ivf",
    "emb_dup_pairs_lsh",
    "emb_semantic_dedup",
    "event_exact_dedup",
    "link_matches",
    "link_fs_scores",
    "threshold_sweep",
    "cluster_graph_stats",
    "meta_shingle_pairs_pruned",
    "turn_boilerplate",
    "doc_repetition_fast",
    "doc_passage_stats_fast",
    "event_sessions",
    "doc_dedup_keep",
    "doc_pii_flags",
    "doc_url_stats",
    "doc_line_dedup",
    "doc_bpe_token_stats",
    "doc_source_stats",
    "doc_top_ngrams",
    "doc_source_percentiles",
    "doc_source_profile_sketch",
    "event_asof_join",
    "event_window_stats",
    "event_rolling_stats",
    "event_interval_join",
    "doc_lang_source_matrix",
    "doc_source_lang_rollup",
    "doc_curation_verdict",
]


def materialize(df) -> tuple[int, int]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("checksum"),
    ).first()
    return int(row["n"]), int(row["checksum"] or 0)


def _membw_probe(workers: int = 8, size_mb: int = 96, reps: int = 2) -> float:
    """~5s STREAM-triad aggregate GB/s at ``workers`` pinned processes.

    Stamped into the bench JSON because this machine is SHARED: its DRAM
    bandwidth varies ~5x day-to-day (BENCH/BASELINE.md host-health
    addendum), and every shuffle-heavy query time scales with it — a
    cross-round BENCH comparison without the day's ceiling number reads
    code regressions into host weather."""
    import multiprocessing as mp

    def worker(q, cpu):
        try:
            os.sched_setaffinity(0, {cpu})
        except OSError:
            pass
        import numpy as np
        n = size_mb * 1024 * 1024 // 8
        a, b, c = np.zeros(n), np.ones(n), np.ones(n)
        t0 = time.time()
        for _ in range(reps):
            a[:] = b + 0.5 * c
        q.put(3 * 8 * n * reps / (time.time() - t0))

    # fork, not spawn: a nested worker function cannot pickle under
    # spawn, and the probe runs before the JVM starts
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [ctx.Process(target=worker, args=(q, i)) for i in range(workers)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return round(sum(vals) / 1e9, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)  # 'transfer' etc. contain 'sf'
    sf = float(m.group(1)) if m else -1.0
    def probe() -> float:
        try:
            return _membw_probe()
        except Exception:
            return -1.0

    # BRACKETED weather stamps: this host's DRAM bandwidth swings 10-100x
    # within hours (BENCH/MEMBW_*.json series), so a single pre-run stamp
    # cannot certify a multi-minute run — r4 shipped a 24.5 GB/s pre-JVM
    # stamp while every same-day probe read 0.1-2.7. Probe before the JVM,
    # once mid-suite (between the pipeline-family group and the per-query
    # tail), and after; bench_table.py refuses cross-round comparisons
    # whose brackets disagree.
    membw_pre = probe()  # before the JVM: quiet machine, clean fork
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(32, 2 * cpus),
        app_name="translink-bench",
    )
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    membw_mid = -1.0
    mid_at = len(BENCH_QUERIES) // 2
    for i, name in enumerate(BENCH_QUERIES):
        if i == mid_at:
            membw_mid = probe()  # JVM idle between queries; fork is of
            # the Python driver only, the heap stays out of the children
        t0 = time.time()
        n, _ = materialize(queries[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        rows[name] = n
    membw_post = probe()
    total = round(sum(timings.values()), 3)
    stamps = [s for s in (membw_pre, membw_mid, membw_post) if s > 0]
    spread = round(max(stamps) / min(stamps), 2) if stamps else -1.0
    result = {
        "metric": "translink_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        # day-of-run DRAM ceiling (GB/s aggregate, 8 pinned workers);
        # healthy ~2.6, degraded days ~0.5-0.9 — see BENCH/BASELINE.md.
        # Kept as the pre-run stamp for round-over-round compatibility;
        # the full bracket lives in membw_stamps.
        "membw_8w_gbps": membw_pre,
        "membw_stamps": {
            "pre": membw_pre, "mid": membw_mid, "post": membw_post,
        },
        # max/min ratio across the bracket — >2 means the weather moved
        # DURING the run and per-query walls are not comparable across runs
        "membw_spread": spread,
    }
    # Durable machine-readable copy FIRST (BENCH_r03.json came back with
    # "parsed": null because the driver's stdout tail-capture truncated the
    # one fat line): the full payload (incl. per-query row counts) lands in
    # BENCH/HEADLINE_r{n}.json, and the stdout contract line stays slim —
    # no "rows" dict, separators without whitespace.
    try:
        import glob
        here = os.path.dirname(os.path.abspath(__file__))
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        n_round = max(rounds, default=0) + 1
        os.makedirs(os.path.join(here, "BENCH"), exist_ok=True)
        payload = dict(result, rows=rows)
        for fname in (f"HEADLINE_r{n_round:02d}.json", "HEADLINE_latest.json"):
            with open(os.path.join(here, "BENCH", fname), "w") as f:
                json.dump(payload, f, indent=1)
    except OSError:
        pass  # read-only checkout: the stdout line is still the contract
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
