"""Structured-Streaming ingestion — the reference's pipelined streaming mode.

The reference processes files as the walker discovers them through bounded
mpsc channels with batch/timeout flushing (``src/pipeline/streaming.rs``,
``src/walker_hp.rs:175-232``). The Spark-native equivalent is a file-source
``readStream`` over the transcript landing directory with ``foreachBatch``:
each micro-batch canonicalizes + signs only the newly arrived conversations
and upserts them into the signature store; full re-clustering runs on the
batch side from the store (T5: the reference's terminal hash stage also
defers global grouping to flush time).

``availableNow`` trigger = the reference's Flush/Shutdown drain semantics;
``maxFilesPerTrigger`` = its bounded channel capacity (backpressure, T4).
No event-time windows/watermarks are needed — the reference has none either
(SURVEY §2.9): its "streaming" is pipelined ingestion, not event-time logic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from translink.canonicalize import canonicalize
from translink.config import LinkConfig
from translink.signatures import with_exact_digest, with_minhash

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_transcript_dir(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-source stream of transcript rows from a landing directory of
    parquet drops (one file = one walker batch)."""
    return (
        spark.readStream
        .schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )


def incremental_signatures(
    spark: SparkSession,
    landing_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    cfg: LinkConfig | None = None,
    available_now: bool = True,
):
    """Run the signature stages incrementally over a transcript stream.

    Each micro-batch: canonicalize + digest + MinHash the arriving rows and
    append to the parquet signature store. Conversations split across
    micro-batches are re-canonicalized by the batch-side consumer (store
    keeps the latest row per (conv_id, batch); dedup happens at read).
    Returns the StreamingQuery; with ``available_now`` the call drains all
    pending files then stops (Flush/Shutdown semantics).
    """
    cfg = cfg or LinkConfig()
    os.makedirs(store_dir, exist_ok=True)
    stream = stream_transcript_dir(spark, landing_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        signed = with_minhash(with_exact_digest(canonicalize(batch_df, cfg)), cfg)
        (
            signed
            .withColumn("_batch_id", F.lit(int(batch_id)).cast("long"))
            .write.mode("append").parquet(store_dir)
        )

    writer = (
        stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_signature_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Latest signature row per conv_id from the append-only store (a
    conversation re-delivered in a later batch supersedes earlier rows)."""
    df = spark.read.parquet(store_dir)
    w = Window.partitionBy("conv_id").orderBy(F.col("_batch_id").desc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_batch_id")
    )
