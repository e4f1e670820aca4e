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


def cluster_report(members: DataFrame) -> DataFrame:
    """Cluster-level rollups over ``elect_primary`` output: member count,
    total chars, and potential savings (chars of all non-primary members —
    the analog of ``potential_savings = size * (n - 1)``,
    ``src/report/mod.rs:111-163``)."""
    return (
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
        stats = global_stats(members)
        lines = ["translink deduplication report", "=" * 34]
        lines += [f"{k:>16}: {v}" for k, v in stats.items()]
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
    else:
        raise ValueError(f"unknown report format: {fmt}")


def format_stats_json(stats: dict) -> str:
    return json.dumps(stats, sort_keys=True, default=str)
