"""Reporting — primary election, cluster rollups, and sinks.

Mirrors the reference's report layer (``src/report/mod.rs``): per-group
primary election by recency (``:133-137``), group/file/savings rollups
(``:111-163``), and text/JSON/CSV formatters
(``src/report/formatters/{text,json,csv}.rs``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window, functions as F


def elect_primary(clusters: DataFrame, canonical: DataFrame) -> DataFrame:
    """Mark one primary member per cluster: newest ``max_ts`` wins, conv_id
    ascending breaks ties (reference sorts by modified desc and keeps the
    first, ``src/report/mod.rs:133-137``)."""
    enriched = clusters.join(
        canonical.select("conv_id", "n_turns", "total_chars", "max_ts"), "conv_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("max_ts").desc(), F.col("conv_id").asc()
    )
    return enriched.withColumn(
        "is_primary", F.row_number().over(w) == 1
    )


def cluster_report(members: DataFrame, scored: DataFrame | None = None) -> DataFrame:
    """Cluster-level rollups over ``elect_primary`` output: member count,
    total chars, and potential savings (chars of all non-primary members —
    the analog of ``potential_savings = size * (n - 1)``,
    ``src/report/mod.rs:111-163``).

    With ``scored`` (pair scores ``conv_id_a, conv_id_b, score``), adds
    ``mean_similarity`` — the mean blended score over intra-cluster scored
    pairs (the reference's per-group similarity H14,
    ``src/pipeline/streaming_hash.rs:256-313``). Clusters with no scored
    pair (pure exact-duplicate groups, which skip similarity scoring on the
    early-exit path) get 1.0 — their members are byte-identical. The mean
    uses a sorted deterministic fold so it is reproducible cross-engine.
    """
    base = (
        members
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("total_chars").alias("total_chars_sum"),
            F.sum(F.when(~F.col("is_primary"), F.col("total_chars")).otherwise(F.lit(0)))
            .alias("savings_chars"),
            F.max("max_ts").alias("newest_ts"),
        )
        .filter(F.col("n_members") >= 2)
    )
    if scored is None:
        return base
    cl = members.select("conv_id", "cluster_id")
    intra = (
        scored
        .join(cl.withColumnRenamed("conv_id", "conv_id_a"), "conv_id_a")
        .join(
            cl.select(
                F.col("conv_id").alias("conv_id_b"),
                F.col("cluster_id").alias("_cb"),
            ),
            "conv_id_b",
        )
        .filter(F.col("cluster_id") == F.col("_cb"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list("score")).alias("_scores"))
        .select(
            "cluster_id",
            (
                F.expr(
                    "aggregate(_scores, cast(0.0 as double), (acc, v) -> acc + v)"
                )
                / F.size("_scores")
            ).alias("mean_similarity"),
        )
    )
    return base.join(intra, "cluster_id", "left").withColumn(
        "mean_similarity", F.coalesce("mean_similarity", F.lit(1.0))
    )


def _top_cluster_members(
    members: DataFrame, max_groups: int, cols: list[str]
) -> list:
    """Full membership of the top-``max_groups`` duplicate clusters ranked by
    savings, collected driver-side in listing order.

    Two steps so no cluster is ever truncated mid-listing: (1) a CLUSTER-level
    rank-and-limit (aggregate rows, one per cluster — bounded by max_groups),
    then (2) the full member sets of exactly those clusters join back and
    collect. The former row cap (``limit(max_groups * 64)``) silently cut
    clusters with >64 members — in interactive mode their unlisted
    non-primary tail was then never dropped."""
    ranked = (
        members
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.when(~F.col("is_primary"), F.col("total_chars"))
                  .otherwise(F.lit(0))).alias("_savings"),
        )
        .filter(F.col("_n") >= 2)
        .orderBy(F.col("_savings").desc(), F.col("cluster_id").asc())
        .limit(max_groups)
    )
    return (
        members
        .join(ranked.select("cluster_id", "_savings"), "cluster_id")
        .orderBy(F.col("_savings").desc(), F.col("cluster_id").asc(),
                 F.col("is_primary").desc(), F.col("conv_id").asc())
        .select(*cols)
        .collect()
    )


def interactive_select(
    members: DataFrame,
    input_fn=None,
    max_groups: int = 200,
) -> list:
    """Interactive per-group confirmation (reference
    ``OperationMode::Interactive``, ``src/config.rs:41-47``): walk duplicate
    groups ranked by savings, show the aligned member listing, and ask
    whether to drop the non-primary members. Returns the conv_ids to drop.

    Driver-side by design — an interactive prompt is a driver artifact; the
    listing is capped at ``max_groups`` so the collect stays bounded.
    Answers: ``y``/empty = drop duplicates of this group, ``n`` = keep all,
    ``a`` = drop for this and every remaining group, ``q`` = keep everything
    from here on.
    """
    if input_fn is None:
        input_fn = input  # bound at call time so tests can monkeypatch it
    groups = _top_cluster_members(
        members, max_groups,
        ["cluster_id", "conv_id", "total_chars", "is_primary", "_savings"],
    )
    by_cluster: dict = {}
    order: list = []
    for r in groups:
        if r["cluster_id"] not in by_cluster:
            by_cluster[r["cluster_id"]] = []
            order.append(r["cluster_id"])
        by_cluster[r["cluster_id"]].append(r)
    to_drop: list = []
    drop_all = False
    for i, cid in enumerate(order, 1):
        rows = by_cluster[cid]
        if not drop_all:
            print(f"group {i}/{len(order)}  cluster={cid}  "
                  f"savings={rows[0]['_savings']} chars")
            for r in rows:
                marker = "*" if r["is_primary"] else " "
                print(f"  [{marker}] {r['conv_id']:<32} chars={r['total_chars']}")
            ans = (input_fn("drop duplicates? [Y/n/a/q] ") or "y").strip().lower()
            if ans == "q":
                break
            if ans == "a":
                drop_all = True
            elif ans == "n":
                continue
        to_drop.extend(r["conv_id"] for r in rows if not r["is_primary"])
    return to_drop


def deduplicate(members: DataFrame) -> DataFrame:
    """Remove-mode materialization (reference ``OperationMode::Remove``,
    ``src/config.rs:41-47``; keep/removable semantics
    ``src/report/mod.rs:53-65``): the deduplicated dataset — exactly one
    primary row per cluster, singletons included. The complement (dropped
    rows) is ``members.filter(~is_primary)``."""
    return members.filter(F.col("is_primary"))


def global_stats(members: DataFrame) -> dict:
    """Scan-level stats row (analog of ``DeduplicationStats``,
    ``src/report/mod.rs:17-33``)."""
    row = (
        members
        .select(
            F.count("*").alias("n_records"),
            F.countDistinct("cluster_id").alias("n_clusters"),
            F.sum(F.when(~F.col("is_primary"), 1).otherwise(0)).alias("n_duplicates"),
            F.sum(F.when(~F.col("is_primary"), F.col("total_chars")).otherwise(F.lit(0)))
            .alias("savings_chars"),
        )
        .first()
    )
    return {k: row[k] for k in ("n_records", "n_clusters", "n_duplicates", "savings_chars")}


def write_report(
    members: DataFrame,
    path: str,
    fmt: str = "json",
) -> None:
    """Write the member-level report. ``json``/``csv`` map to distributed
    DataFrame writers (S10/S11); ``text`` renders a driver-side summary
    (S9 — the reference's aligned text formatter is inherently driver-side).
    """
    if fmt == "json":
        members.write.mode("overwrite").json(path)
    elif fmt == "csv":
        members.write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "text":
        text = format_text_report(members)
        if "://" in path:
            # hdfs/s3a outputs go through the Hadoop FileSystem API like
            # the catalog manifest does — a local open() on a remote URI
            # fails on the driver AFTER the whole pipeline already ran
            spark = members.sparkSession
            jvm = spark.sparkContext._jvm
            conf = spark.sparkContext._jsc.hadoopConfiguration()
            p = jvm.org.apache.hadoop.fs.Path(path)
            out = p.getFileSystem(conf).create(p, True)
            try:
                out.write(bytearray(text.encode()))
            finally:
                out.close()
        else:
            with open(path, "w") as fh:
                fh.write(text)
    else:
        raise ValueError(f"unknown report format: {fmt}")


def format_text_report(members: DataFrame, max_groups: int = 50) -> str:
    """Aligned, human-readable group listing with a stats header and legend —
    the analog of the reference's text formatter
    (``src/report/formatters/text.rs:10-97``). Driver-side by design (a
    console report is a driver artifact); the listing is capped at
    ``max_groups`` clusters ranked by savings so the collect stays bounded
    at any corpus size.
    """
    stats = global_stats(members)
    rows = _top_cluster_members(
        members, max_groups,
        ["cluster_id", "conv_id", "n_turns", "total_chars",
         "max_ts", "is_primary", "_savings"],
    )
    lines = [
        "translink deduplication report",
        "=" * 62,
        f"{'conversations':>18}: {stats['n_records']}",
        f"{'clusters':>18}: {stats['n_clusters']}",
        f"{'duplicates':>18}: {stats['n_duplicates']}",
        f"{'savings (chars)':>18}: {stats['savings_chars']}",
        "",
        "duplicate groups (by potential savings)",
        "-" * 62,
    ]
    gid = 0
    seen: set = set()
    for r in rows:
        if r["cluster_id"] not in seen:
            seen.add(r["cluster_id"])
            gid += 1
            lines.append(
                f"group {gid}  cluster={r['cluster_id']}  "
                f"savings={r['_savings']} chars"
            )
        marker = "*" if r["is_primary"] else " "
        lines.append(
            f"  [{marker}] {r['conv_id']:<32} turns={r['n_turns']:<5} "
            f"chars={r['total_chars']:<8} ts={r['max_ts']}"
        )
    lines += [
        "-" * 62,
        "legend: [*] primary (kept)   [ ] duplicate (removable)",
    ]
    return "\n".join(lines) + "\n"


def format_stats_json(stats: dict) -> str:
    return json.dumps(stats, sort_keys=True, default=str)


def format_link_text_report(
    matches: DataFrame, sort_col: str, max_rows: int = 50
) -> str:
    """Aligned text listing of cross-corpus matches (the linkage analog of
    ``format_text_report``; S9 discipline — a console report is a driver
    artifact, capped at ``max_rows`` best matches so the collect stays
    bounded at any corpus size)."""
    n_matches = matches.count()
    cols = [c for c in matches.columns
            if c not in ("conv_id_a", "conv_id_b")]
    rows = (
        matches.orderBy(F.col(sort_col).desc(), F.col("conv_id_a").asc())
        .limit(max_rows)
        .collect()
    )
    lines = [
        "translink linkage report",
        "=" * 62,
        f"{'matched pairs':>18}: {n_matches}",
        "",
        f"best matches (by {sort_col}, top {max_rows})",
        "-" * 62,
    ]
    for r in rows:
        vals = "  ".join(
            f"{c}={r[c]:.6f}" if isinstance(r[c], float) else f"{c}={r[c]}"
            for c in cols
        )
        lines.append(f"  {r['conv_id_a']:<28} <-> {r['conv_id_b']:<28} {vals}")
    lines.append("-" * 62)
    return "\n".join(lines) + "\n"


def write_link_report(
    matches: DataFrame, path: str, fmt: str = "json", sort_col: str = "score"
) -> None:
    """Write the match-level linkage report: ``json``/``csv`` distributed
    writers (S10/S11), ``text`` the driver-side capped listing (S9)."""
    if fmt == "json":
        matches.write.mode("overwrite").json(path)
    elif fmt == "csv":
        matches.write.mode("overwrite").option("header", True).csv(path)
    elif fmt == "text":
        text = format_link_text_report(matches, sort_col)
        with open(path, "w") as fh:
            fh.write(text)
    else:
        raise ValueError(f"unknown report format: {fmt}")
