"""Bucketed storage — co-located joins and aggregations with NO exchange.

At 10^12-turn scale the dominant cost of every self-join and re-keyed
aggregation is the shuffle. Spark's native bucketing moves that shuffle
to WRITE time, once: a table written with ``bucketBy(n, keys)`` hash-
partitions rows into ``n`` stable buckets per the same hash a shuffle
would use, so a later join or groupBy on those keys reads both sides
already co-located — the plan contains no Exchange at all (asserted by
tests on the physical plan). Re-running the pipeline over a bucketed
signature store therefore pays zero shuffle for candidate generation,
which is exactly the amortization an incremental 100 TB deployment
needs: shuffle once at ingest, join forever.

Rules enforced here (Spark silently falls back to shuffling if broken):
- both sides bucketed by the SAME keys with the SAME bucket count;
- the join keys must equal the bucket keys;
- bucket count is a write-time constant — size it once for the target
  corpus (buckets ~ corpus_rows / rows_per_task), not per run.

Reference analog: the reference groups by hash once and reuses the
grouping across stages (``src/pipeline/stats.rs`` hash-and-group);
bucketing is the storage-persistent form of that reuse.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) by ``keys``.
    ``path`` makes it an external table (the data survives DROP TABLE)."""
    keys = list(keys)
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(int(buckets), keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys. With
    matching bucket specs the physical plan is a sort-merge join over the
    bucketed scans — zero Exchange (the write already co-located them)."""
    return spark.table(left_table).join(
        spark.table(right_table), list(keys), how
    )
