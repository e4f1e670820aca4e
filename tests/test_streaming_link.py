"""Streaming record linkage: new B-side conversations matched against a
static reference corpus A on arrival (translink/streaming/link.py) —
first-come-first-served assignment, batch-equivalence on a single drop,
replay-safe per-batch partitions."""

import os
from datetime import datetime

from pyspark.sql import functions as F

from translink.config import LinkConfig
from translink.linkage import link_candidate_pairs, mutual_best_matches
from translink.scoring import score_pairs
from translink.streaming.link import (
    incremental_link,
    prepare_reference,
    read_match_store,
)

CFG = LinkConfig()


def _turns(spark, convs: dict[str, str]):
    """One 2-turn conversation per (conv_id -> base text)."""
    rows = []
    for cid, text in convs.items():
        for i in range(2):
            rows.append(
                (cid, i, "user" if i == 0 else "assistant",
                 f"{text} turn {i}", None, datetime(2026, 1, 1, 0, i))
            )
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


A_TEXTS = {
    "a1": "the quick brown fox jumps over the lazy dog again and again",
    "a2": "completely different subject matter about database systems here",
    "a3": "a third reference conversation about streaming watermarks now",
}


def test_streaming_link_first_come_first_served(spark, tmp_path):
    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    os.makedirs(landing)

    prepare_reference(spark, _turns(spark, A_TEXTS), store, CFG)
    # drop 0: b1 is a copy of a1 -> must match a1
    _turns(spark, {"b1": A_TEXTS["a1"]}).coalesce(1).write.parquet(
        os.path.join(landing, "d0")
    )
    q = incremental_link(
        spark, os.path.join(landing, "*"), store,
        str(tmp_path / "ckpt0"), CFG, available_now=True,
    )
    q.awaitTermination(300)
    # drop 1: b2 also copies a1 (taken -> unmatched), b3 copies a2
    _turns(
        spark, {"b2": A_TEXTS["a1"], "b3": A_TEXTS["a2"]}
    ).coalesce(1).write.parquet(os.path.join(landing, "d1"))
    q2 = incremental_link(
        spark, os.path.join(landing, "*"), store,
        str(tmp_path / "ckpt1"), CFG, available_now=True,
    )
    q2.awaitTermination(300)

    matches = {
        r["conv_id_b"]: r for r in read_match_store(spark, store).collect()
    }
    assert matches["b1"]["conv_id_a"] == "a1"
    assert matches["b3"]["conv_id_a"] == "a2"
    assert "b2" not in matches          # a1 was taken in an earlier batch
    # one row per A and per B
    all_rows = read_match_store(spark, store)
    assert all_rows.count() == all_rows.select("conv_id_a").distinct().count()


def test_streaming_link_single_drop_equals_batch(spark, tmp_path):
    landing = str(tmp_path / "landing_b")
    store = str(tmp_path / "store_b")
    os.makedirs(landing)

    b_texts = {"b1": A_TEXTS["a1"], "b3": A_TEXTS["a2"], "b9": "unrelated"}
    a = _turns(spark, A_TEXTS)
    b = _turns(spark, b_texts)
    prepare_reference(spark, a, store, CFG)
    b.coalesce(1).write.parquet(os.path.join(landing, "d0"))
    q = incremental_link(
        spark, os.path.join(landing, "*"), store,
        str(tmp_path / "ckpt_b"), CFG, available_now=True,
    )
    q.awaitTermination(300)
    streamed = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in read_match_store(spark, store).collect()
    }

    # the batch operator over the same two corpora (same scorer config)
    from translink.canonicalize import canonicalize
    from translink.blocking import with_block_key
    from translink.signatures import shingles_expr

    def prep(t):
        c = with_block_key(canonicalize(t, CFG), CFG)
        return c.withColumn(
            "shingles", shingles_expr("canon_text", CFG.shingle_size)
        )

    pairs = link_candidate_pairs(
        prep(a), prep(b), CFG, payload_cols=["canon_text", "shingles"]
    )
    batch = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in mutual_best_matches(
            score_pairs(pairs, CFG, include_jaro_winkler=False), CFG
        ).collect()
    }
    assert streamed == batch
    assert ("a1", "b1") in streamed


def test_streaming_link_fs_model(spark, tmp_path):
    """FS scoring lane: score in the match store is the match WEIGHT, the
    exact-copy pair clears the 0.95-posterior weight threshold, and the
    unrelated record never matches."""
    landing = str(tmp_path / "landing_fs")
    store = str(tmp_path / "store_fs")
    os.makedirs(landing)

    prepare_reference(spark, _turns(spark, A_TEXTS), store, CFG)
    _turns(
        spark, {"b1": A_TEXTS["a1"], "b9": "wholly unrelated text here"}
    ).coalesce(1).write.parquet(os.path.join(landing, "d0"))
    q = incremental_link(
        spark, os.path.join(landing, "*"), store,
        str(tmp_path / "ckpt_fs"), CFG, available_now=True, model="fs",
    )
    q.awaitTermination(300)
    rows = {r["conv_id_b"]: r for r in read_match_store(spark, store).collect()}
    assert set(rows) == {"b1"}
    assert rows["b1"]["conv_id_a"] == "a1"
    from translink.fellegi_sunter import fs_weight_threshold

    assert rows["b1"]["score"] >= fs_weight_threshold(0.95)
