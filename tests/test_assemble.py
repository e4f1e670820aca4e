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
