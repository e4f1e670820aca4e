"""Structured-Streaming ingestion: availableNow drain, incremental
signatures, store read-back (T1-T7 analogs; SURVEY §2.9)."""

import os

from pyspark.sql import functions as F

from translink import fixtures
from translink.clustering import exact_clusters
from translink.config import LinkConfig
from translink.streaming import incremental_signatures
from translink.streaming.incremental import read_signature_store


def test_incremental_signature_stream(spark, tiny, tmp_path):
    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    t = tiny["transcripts"]
    # drop the corpus as several files, whole conversations per drop (the
    # walker's batch semantics: a record arrives complete)
    convs = [r["conv_id"] for r in t.select("conv_id").distinct().collect()]
    third = max(1, len(convs) // 3)
    batches = [convs[:third], convs[third:2 * third], convs[2 * third:]]
    for i, batch in enumerate(batches):
        (
            t.filter(F.col("conv_id").isin(batch))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(landing, f"drop_{i}"))
        )
    # stream source reads the directory tree's parquet files
    q = incremental_signatures(
        spark,
        landing_dir=os.path.join(landing, "*"),
        store_dir=store,
        checkpoint_dir=ckpt,
        available_now=True,
    )
    q.awaitTermination(300)

    signed = read_signature_store(spark, store)
    assert signed.count() == len(convs)
    # signatures from the stream equal batch-mode signatures
    from translink.canonicalize import canonicalize
    from translink.signatures import with_exact_digest

    batch_signed = with_exact_digest(canonicalize(t, LinkConfig()))
    joined = signed.select("conv_id", "digest_md5").alias("s").join(
        batch_signed.select("conv_id", "digest_md5").alias("b"), "conv_id"
    )
    mismatch = joined.filter(F.col("s.digest_md5") != F.col("b.digest_md5")).count()
    assert mismatch == 0
    # downstream batch clustering over the streamed store works
    ec = exact_clusters(signed)
    assert ec.filter(F.col("conv_id").startswith("hot_")).count() >= 20


def test_stream_is_incremental(spark, tiny, tmp_path):
    """A second drain with one new file only processes the new file."""
    landing = str(tmp_path / "landing2")
    store = str(tmp_path / "store2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(landing)
    t = tiny["transcripts"]
    t.filter(F.col("conv_id").startswith("hot_")).coalesce(1) \
        .write.mode("overwrite").parquet(os.path.join(landing, "d0"))
    q = incremental_signatures(
        spark, os.path.join(landing, "*"), store, ckpt, available_now=True
    )
    q.awaitTermination(300)
    n1 = read_signature_store(spark, store).count()

    t.filter(F.col("conv_id") == "conv_000000").coalesce(1) \
        .write.mode("overwrite").parquet(os.path.join(landing, "d1"))
    q2 = incremental_signatures(
        spark, os.path.join(landing, "*"), store, ckpt, available_now=True
    )
    q2.awaitTermination(300)
    signed = read_signature_store(spark, store)
    assert signed.count() == n1 + 1
    assert signed.filter(F.col("conv_id") == "conv_000000").count() == 1
