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


def test_split_conversation_repaired_at_read(spark, tiny, tmp_path):
    """A conversation whose turns arrive across two drops must read back
    with the FULL canonical text — per-batch partial signatures are
    discarded and the conversation is re-canonicalized from the turn store."""
    landing = str(tmp_path / "landing3")
    store = str(tmp_path / "store3")
    ckpt = str(tmp_path / "ckpt3")
    os.makedirs(landing)
    t = tiny["transcripts"]
    victim = "conv_000000"
    # drop 0: victim's first half + some whole conversations
    first = t.filter(
        (F.col("conv_id") == victim) & (F.col("turn_idx") < 2)
        | (F.col("conv_id") == "conv_000001")
    )
    second = t.filter((F.col("conv_id") == victim) & (F.col("turn_idx") >= 2))
    first.coalesce(1).write.parquet(os.path.join(landing, "d0"))
    q = incremental_signatures(
        spark, os.path.join(landing, "*"), store, ckpt, available_now=True
    )
    q.awaitTermination(300)
    second.coalesce(1).write.parquet(os.path.join(landing, "d1"))
    q2 = incremental_signatures(
        spark, os.path.join(landing, "*"), store, ckpt, available_now=True
    )
    q2.awaitTermination(300)

    signed = read_signature_store(spark, store)
    assert signed.filter(F.col("conv_id") == victim).count() == 1
    # digest equals the batch-mode digest over the WHOLE conversation
    from translink.canonicalize import canonicalize
    from translink.signatures import with_exact_digest

    batch = with_exact_digest(
        canonicalize(t.filter(F.col("conv_id") == victim), LinkConfig())
    ).first()
    streamed = signed.filter(F.col("conv_id") == victim).first()
    assert streamed["digest_md5"] == batch["digest_md5"]
    assert streamed["n_turns"] == batch["n_turns"]


def test_same_batch_duplicate_turn_slot_matches_batch(spark, tiny, tmp_path):
    """A drop that ships TWO rows for one (conv_id, turn_idx) slot (a
    malformed-but-real producer case) must read back exactly as a batch run
    over the same delivery: batch canonicalize keeps BOTH rows (array_sort
    keeps duplicates), so the store merge must keep every row of the
    winning batch per slot — not row_number-pick one, which diverged from
    batch and picked nondeterministically when the duplicates tied on
    batch id."""
    landing = str(tmp_path / "landing_dup")
    store = str(tmp_path / "store_dup")
    ckpt = str(tmp_path / "ckpt_dup")
    os.makedirs(landing)
    t = tiny["transcripts"]
    victim = "conv_000000"
    first = t.filter((F.col("conv_id") == victim) & (F.col("turn_idx") < 2))
    tail = t.filter((F.col("conv_id") == victim) & (F.col("turn_idx") >= 2))
    dup = tail.filter(F.col("turn_idx") == 2).withColumn(
        "text", F.lit("DUPLICATE SLOT PAYLOAD")
    )
    second = tail.unionByName(dup)
    first.coalesce(1).write.parquet(os.path.join(landing, "d0"))
    q = incremental_signatures(
        spark, os.path.join(landing, "*"), store, ckpt, available_now=True
    )
    q.awaitTermination(300)
    second.coalesce(1).write.parquet(os.path.join(landing, "d1"))
    q2 = incremental_signatures(
        spark, os.path.join(landing, "*"), store, ckpt, available_now=True
    )
    q2.awaitTermination(300)

    signed = read_signature_store(spark, store)
    from translink.canonicalize import canonicalize
    from translink.signatures import with_exact_digest

    batch = with_exact_digest(
        canonicalize(first.unionByName(second), LinkConfig())
    ).first()
    streamed = signed.filter(F.col("conv_id") == victim).first()
    assert streamed["n_turns"] == batch["n_turns"]  # duplicate row counted
    assert streamed["digest_md5"] == batch["digest_md5"]


def test_replacement_redelivery_drops_deleted_turns(spark, tmp_path):
    """A conversation re-delivered WHOLE with turns removed (redaction) must
    read back as the latest delivery only: merge-only semantics would keep
    the stale turns 2-3 and the repaired digest would cover deleted content.
    'auto' classifies the newest batch as a replacement (turn 0 + contiguous
    range); 'merge' keeps the old union semantics on request."""
    import datetime

    from translink.canonicalize import canonicalize
    from translink.signatures import with_exact_digest

    landing = str(tmp_path / "landing4")
    store = str(tmp_path / "store4")
    ckpt = str(tmp_path / "ckpt4")
    os.makedirs(landing)
    ts = datetime.datetime(2026, 1, 1)
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp")
    original = spark.createDataFrame(
        [("A", i, "user", f"turn {i} secret-{i}", None, ts) for i in range(4)]
        + [("B", 0, "user", "bystander", None, ts)],
        ddl,
    )
    redacted = spark.createDataFrame(
        [("A", i, "user", f"turn {i} secret-{i}", None, ts) for i in range(2)],
        ddl,
    )
    original.coalesce(1).write.parquet(os.path.join(landing, "d0"))
    q = incremental_signatures(
        spark, os.path.join(landing, "*"), store, ckpt, available_now=True
    )
    q.awaitTermination(300)
    redacted.coalesce(1).write.parquet(os.path.join(landing, "d1"))
    q2 = incremental_signatures(
        spark, os.path.join(landing, "*"), store, ckpt, available_now=True
    )
    q2.awaitTermination(300)

    def digest_of(df, cfg):
        return with_exact_digest(canonicalize(df, cfg)).first()["digest_md5"]

    # default (auto): A == batch run over the LATEST delivery (2 turns)
    got = read_signature_store(spark, store).filter(F.col("conv_id") == "A").first()
    assert got["n_turns"] == 2
    assert got["digest_md5"] == digest_of(redacted, LinkConfig())
    # explicit merge: union semantics (all 4 turns survive)
    cfg_m = LinkConfig(stream_redelivery="merge")
    got_m = read_signature_store(spark, store, cfg_m) \
        .filter(F.col("conv_id") == "A").first()
    assert got_m["n_turns"] == 4
    assert got_m["digest_md5"] == digest_of(original.filter("conv_id = 'A'"), cfg_m)


def test_incremental_recluster_matches_batch(spark, tiny, tmp_path):
    """Two drops + affected-component re-clustering == one-shot batch
    clustering over the merged corpus (byte-identical labels)."""
    from translink.canonicalize import canonicalize
    from translink.clustering import (
        clusters_with_singletons, connected_components, exact_edges,
    )
    from translink.pipeline import run_pipeline
    from translink.signatures import with_exact_digest, with_minhash
    from translink.streaming.incremental import recluster_incremental

    cfg = LinkConfig()
    # the equivalence contract holds when no block overflows max_block_size
    # (see recluster_incremental docstring) — drop the planted hot-key rows,
    # whose size-dependent salting is deliberately run-dependent
    t = tiny["transcripts"].filter(~F.col("conv_id").startswith("hot_"))
    convs = sorted(r["conv_id"] for r in t.select("conv_id").distinct().collect())
    # 70/30 split: old corpus, then a drop of new conversations
    cut = int(len(convs) * 0.7)
    old_ids, new_ids = set(convs[:cut]), set(convs[cut:])
    old_t = t.filter(F.col("conv_id").isin(list(old_ids)))

    prev = run_pipeline(spark, old_t, cfg)["clusters"]
    signed_all = with_minhash(with_exact_digest(canonicalize(t, cfg)), cfg) \
        .localCheckpoint(eager=True)
    new_df = spark.createDataFrame(
        [(c,) for c in sorted(new_ids)], "conv_id string"
    )
    inc = recluster_incremental(spark, signed_all, prev, new_df, cfg)

    batch = run_pipeline(spark, t, cfg)["clusters"]
    diff = (
        inc.withColumnRenamed("cluster_id", "inc_cl")
        .join(batch, "conv_id", "full")
        .filter(
            F.col("inc_cl").isNull() | F.col("cluster_id").isNull()
            | (F.col("inc_cl") != F.col("cluster_id"))
        )
    )
    assert diff.count() == 0, diff.limit(20).collect()


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
