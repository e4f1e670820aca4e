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
    from pyspark.sql import Window

    t = tiny["transcripts"]
    c = canonicalize(t, LinkConfig(turn_text_cap=100_000))
    back = explode_canonical(c)
    # rank the source by turn order: canon positions are 0-based ranks,
    # which equal turn_idx only for contiguous indices (gapped inputs —
    # e.g. strip_boilerplate output — still round-trip by position)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    src = t.select(
        "conv_id",
        "turn_idx",
        F.coalesce("role", F.lit("")).alias("role"),
        F.coalesce("text", F.lit("")).alias("text"),
    ).select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_pos"),
        "role",
        "text",
    )
    diff = (
        src.join(back, ["conv_id", "turn_pos"], "full")
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


# -- boilerplate turns ------------------------------------------------------

def _bp_fixture(spark):
    sysmsg = "you are a helpful assistant"
    rows = []
    for c in range(5):
        rows.append((f"c{c}", 0, "user", sysmsg, None))
        rows.append((f"c{c}", 1, "assistant", f"unique reply {c}", None))
    # same text as sysmsg but a different role: distinct key
    rows.append(("c9", 0, "assistant", sysmsg, None))
    # repeated twice INSIDE one conversation only
    rows.append(("c8", 0, "tool", "retry", None))
    rows.append(("c8", 1, "tool", "retry", None))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ), sysmsg


def test_turn_boilerplate_flags_cross_conv_repeats(spark):
    from translink.canonicalize import turn_boilerplate

    df, sysmsg = _bp_fixture(spark)
    got = turn_boilerplate(df, min_convs=3).collect()
    assert len(got) == 1
    r = got[0]
    assert r["role"] == "user" and r["n_convs"] == 5 and r["n_turns"] == 5
    assert r["total_chars"] == 5 * len(sysmsg)


def test_turn_boilerplate_keys_on_role_and_counts_distinct_convs(spark):
    from translink.canonicalize import turn_boilerplate

    df, _ = _bp_fixture(spark)
    # role is part of the key: the assistant copy of the system text does
    # not merge with the user copies; within-conversation repetition does
    # not inflate n_convs
    by_key = {(r["role"], r["n_convs"], r["n_turns"])
              for r in turn_boilerplate(df, min_convs=1).collect()}
    assert ("assistant", 1, 1) in by_key   # lone assistant copy of sysmsg
    assert ("tool", 1, 2) in by_key        # c8's double retry: 1 conv, 2 turns


def test_strip_boilerplate_removes_exactly_the_flagged_turns(spark):
    from translink.canonicalize import strip_boilerplate

    df, sysmsg = _bp_fixture(spark)
    kept = strip_boilerplate(df, min_convs=3)
    assert kept.columns == df.columns
    rows = kept.collect()
    assert not any(r["text"] == sysmsg and r["role"] == "user" for r in rows)
    # everything else survives, including the same-text-other-role turn
    assert len(rows) == df.count() - 5
    assert any(r["conv_id"] == "c9" for r in rows)


def test_separator_injection_cannot_forge_exact_dup(spark):
    """A single turn whose TEXT embeds the RS/US separators must not
    canonicalize byte-equal to a structurally different conversation
    (false exact-dup merge); separators are stripped from payload."""
    rows = [
        # conv A: one turn whose text smuggles 'RS ok US assistant RS ok'
        ("A", 0, "user", "hi\x1fassistant\x1eok", None, None),
        # conv B: the two-turn conversation A tries to impersonate
        ("B", 0, "user", "hi", None, None),
        ("B", 1, "assistant", "ok", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    c = {r["conv_id"]: r["canon_text"] for r in canonicalize(t, LinkConfig()).collect()}
    assert c["A"] != c["B"]
    assert c["A"] == "user\x1ehiassistantok"   # separators stripped, not kept
    assert c["B"] == "user\x1ehi\x1fassistant\x1eok"


def test_strip_boilerplate_handles_null_role(spark):
    """Null-role boilerplate must be stripped too: the anti-join is
    null-safe on role (plain equality never matches NULL = NULL)."""
    from translink.canonicalize import strip_boilerplate

    rows = [(f"c{i}", 0, None, "canned preamble", None, None) for i in range(5)]
    rows += [(f"c{i}", 1, "user", f"real content {i}", None, None) for i in range(5)]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = strip_boilerplate(t, min_convs=3)
    assert out.count() == 5
    assert out.filter(out["text"] == "canned preamble").count() == 0


def test_null_conv_id_rows_dropped(spark):
    """Entry validation: a turn row with NULL conv_id belongs to no
    conversation. Grouping it would mint a NULL-keyed record that the
    `conv_id_a < conv_id_b` candidate join silently drops and the clusterer
    cannot key — canonicalize drops the row instead."""
    rows = [
        ("c1", 0, "user", "hello", None, None),
        ("c1", 1, "assistant", "hi", None, None),
        (None, 0, "user", "orphan turn", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = canonicalize(t).collect()
    assert [r["conv_id"] for r in got] == ["c1"]
    assert got[0]["n_turns"] == 2
