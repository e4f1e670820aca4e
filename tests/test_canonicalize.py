"""Canonicalization: determinism, stable turn ordering, per-turn invariant.

Mirrors the reference's metadata-stage tests (``tests/pipeline_test.rs:38-83``)
and the input_hint row-level invariant: per-turn text equality under stable
turn ordering.
"""

from pyspark.sql import functions as F

from translink.canonicalize import canonicalize, explode_canonical, TURN_SEP
from translink.config import LinkConfig


def test_shuffled_input_same_canonical(spark, tiny):
    """Shuffled row order must produce byte-identical canonical text."""
    t = tiny["transcripts"]
    c1 = canonicalize(t)
    c2 = canonicalize(t.orderBy(F.rand(seed=7)))
    joined = c1.alias("a").join(c2.alias("b"), "conv_id")
    mismatches = joined.filter(
        (F.col("a.canon_text") != F.col("b.canon_text"))
        | (F.col("a.n_turns") != F.col("b.n_turns"))
    ).count()
    assert mismatches == 0
    assert c1.count() == c2.count()


def test_per_turn_text_equality_roundtrip(spark, tiny):
    """input_hint invariant: exploding the canonical text reproduces every
    turn's text at its turn position (for texts under the cap)."""
    t = tiny["transcripts"]
    c = canonicalize(t, LinkConfig(turn_text_cap=100_000))
    back = explode_canonical(c)
    src = t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.coalesce("role", F.lit("")).alias("role"),
        F.coalesce("text", F.lit("")).alias("text"),
    )
    diff = (
        src.join(back, ["conv_id", "turn_idx"], "full")
        .filter(
            (src["text"] != back["text"]) | (src["role"] != back["role"])
            | src["text"].isNull() | back["text"].isNull()
        )
        .count()
    )
    assert diff == 0


def test_counts_and_aggregates(spark, tiny):
    t = tiny["transcripts"]
    c = canonicalize(t)
    assert c.count() == t.select("conv_id").distinct().count()
    row = (
        c.join(
            t.groupBy("conv_id").agg(
                F.count("*").alias("nt"),
                F.sum(F.length(F.coalesce("text", F.lit("")))).alias("tc"),
            ),
            "conv_id",
        )
        .filter((F.col("n_turns") != F.col("nt")) | (F.col("total_chars") != F.col("tc")))
        .count()
    )
    assert row == 0


def test_turn_cap_bounds_canon_text(spark):
    rows = [("c1", 0, "user", "x" * 10_000, None, None)]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    c = canonicalize(t, LinkConfig(turn_text_cap=256)).first()
    assert len(c["canon_text"]) <= 256 + 16
    assert c["total_chars"] == 10_000  # blocking attr stays uncapped


def test_empty_text_roundtrip(spark):
    rows = [
        ("c1", 0, "user", "", None, None),
        ("c1", 1, "assistant", "", None, None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    c = canonicalize(t).first()
    assert c["canon_text"].count(TURN_SEP) == 1
    assert c["total_chars"] == 0
