"""Stateful conversation assembly (applyInPandasWithState): cross-batch
accumulation, emit-on-marker, out-of-order repair, re-delivery override,
open conversations held back, and batch-twin equivalence."""

import pytest
from pyspark.sql import functions as F

from translink.streaming.assemble import (
    assemble_conversations_batch, assemble_conversations_stream,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _run_stream(spark, src):
    stream = (
        spark.readStream.schema(
            spark.read.parquet(src).schema
        ).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = assemble_conversations_stream(stream)
    qname = "test_assemble_mem"
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return {
        r["conv_id"]: (r["n_turns"], r["transcript"], r["complete"])
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    }


def test_cross_batch_assembly_and_held_open(spark, tmp_path):
    src = str(tmp_path / "asm_src")
    # batch 1: conv a's first turns OUT OF ORDER; conv b starts (never ends)
    spark.createDataFrame(
        [
            ("a", 1, "assistant", "hi there"),
            ("a", 0, "user", "hello"),
            ("b", 0, "user", "orphan"),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2: conv a re-delivers turn 1 (override), finishes, and ends
    spark.createDataFrame(
        [
            ("a", 1, "assistant", "hi!"),
            ("a", 2, "user", "bye"),
            ("a", 99, "__end__", ""),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    got = _run_stream(spark, src)
    assert got == {
        "a": (3, "user: hello\nassistant: hi!\nuser: bye", True)
    }  # b is still open -> not emitted; re-delivered turn 1 took the new text


def test_end_marker_without_payload(spark, tmp_path):
    src = str(tmp_path / "asm_empty")
    spark.createDataFrame(
        [("e", 99, "__end__", "")], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    assert _run_stream(spark, src) == {"e": (0, "", True)}


def test_stream_matches_batch_twin(spark, tmp_path):
    rows = [
        ("c1", 0, "user", "q1"), ("c1", 1, "assistant", "a1"),
        ("c1", 99, "__end__", ""),
        ("c2", 0, "user", "q2"), ("c2", 1, "assistant", "a2"),
        ("c2", 2, "user", "q3"), ("c2", 99, "__end__", ""),
        ("c3", 0, "user", "open"),   # no marker: emitted by neither
        # re-delivered turn: both twins must pick the same order-free winner
        ("c4", 0, "user", "first delivery"),
        ("c4", 0, "user", "second delivery"),
        ("c4", 1, "assistant", None),  # null text normalizes to ''
        ("c4", 99, "__end__", ""),
        ("c5", 99, "__end__", ""),     # marker-only conversation
    ]
    turns = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / "asm_eq")
    turns.coalesce(1).write.mode("overwrite").parquet(src)

    got = _run_stream(spark, src)
    want = {
        r["conv_id"]: (r["n_turns"], r["transcript"], r["complete"])
        for r in assemble_conversations_batch(turns).collect()
    }
    assert got == want and set(want) == {"c1", "c2", "c4", "c5"}
    assert want["c4"] == (2, "user: second delivery\nassistant: ", True)
    assert want["c5"] == (0, "", True)


def test_separator_in_text_survives_cross_batch_state(spark, tmp_path):
    """A held turn whose text contains the US/RS separators must not
    corrupt the packed state: before the fix, split() on the next batch
    misaligned the zip and scrambled/dropped turns. Both twins strip the
    separators, so stream == batch."""
    src = str(tmp_path / "asm_sep")
    spark.createDataFrame(
        [("s1", 0, "user", "a\x1fb\x1ec")], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [("s1", 1, "assistant", "ok"), ("s1", 99, "__end__", "")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    got = _run_stream(spark, src)
    assert got == {"s1": (2, "user: abc\nassistant: ok", True)}


def test_redelivered_end_marker_emits_once(spark, tmp_path):
    """An at-least-once source re-delivering the __end__ marker in a later
    micro-batch must NOT re-emit a spurious empty row: the tombstone state
    consumes duplicates, matching the batch twin's marker dedup."""
    src = str(tmp_path / "asm_dup_end")
    spark.createDataFrame(
        [("d1", 0, "user", "x"), ("d1", 99, "__end__", "")], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [("d1", 99, "__end__", "")], SCHEMA  # duplicate delivery
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = assemble_conversations_stream(stream)
    qname = "test_assemble_dup_end"
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    assert len(rows) == 1  # exactly once, not a second (d1, 0, "", True)
    assert (rows[0]["n_turns"], rows[0]["complete"]) == (1, True)


def test_null_role_and_turn_idx_match_batch(spark, tmp_path):
    """Null-role and null-turn_idx rows are dropped by BOTH twins (the
    batch filter's null comparison already dropped them; the stream kernel
    used to crash on max() vs None / int(None))."""
    rows = [
        ("n1", 0, "user", "keep"),
        ("n1", 1, None, "dropped: null role"),
        ("n1", None, "assistant", "dropped: null idx"),
        ("n1", 99, "__end__", ""),
    ]
    turns = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / "asm_nulls")
    turns.coalesce(1).write.mode("overwrite").parquet(src)

    got = _run_stream(spark, src)
    want = {
        r["conv_id"]: (r["n_turns"], r["transcript"], r["complete"])
        for r in assemble_conversations_batch(turns).collect()
    }
    assert got == want == {"n1": (1, "user: keep", True)}
