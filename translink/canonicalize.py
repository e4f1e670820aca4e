"""Stage 0 — canonicalize turn rows into per-conversation records.

The reference's unit of dedup is one file (``FileInfo``, reference
``src/types.rs:6-20``); ours is one conversation. A conversation's canonical
form is its turns in stable ``(turn_idx)`` order, each turn rendered as
``role <RS> text`` and joined with ``<US>`` — the analog of a file's
deterministic byte order. The per-row invariant (BASELINE input_hint):
per-turn text equality under stable turn ordering — two conversations are
exact duplicates iff their canonical texts are byte-equal.

Pure DataFrame ops: ``array_sort(collect_list(struct(...)))`` gives a
deterministic order-insensitive aggregation regardless of input row order
(shuffled input produces the identical canonical record — tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from translink.config import LinkConfig

#: Separators woven into the canonical text. ASCII RS/US control characters —
#: cannot appear in normal transcript text, so turn boundaries are unambiguous.
ROLE_SEP = chr(30)
TURN_SEP = chr(31)

#: Output schema of this stage (progressively enriched downstream, the analog
#: of the reference's ``Option<>``-filled columns, src/types.rs:15-17).
CANONICAL_COLUMNS = [
    "conv_id", "n_turns", "total_chars", "canon_text", "first_ts", "max_ts",
]


def canonicalize(transcripts: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Reduce ``transcripts(conv_id, turn_idx, role, text, tool, ts)`` to one
    row per conversation.

    Columns produced:
      - ``n_turns``      — cheap O(1) blocking attribute (analog of file
                           ``size``, reference src/types.rs:9).
      - ``total_chars``  — second cheap blocking attribute (uncapped).
      - ``canon_text``   — turns sorted by ``turn_idx``, each
                           ``role<RS>text`` (text capped at
                           ``cfg.turn_text_cap`` chars — bounded per-row cost
                           at 10^12-turn scale, the analog of the reference's
                           bounded content sampling,
                           src/pipeline/stats.rs:109-115), joined by ``<US>``.
      - ``first_ts`` / ``max_ts`` — recency attributes; ``max_ts`` elects the
                           primary record per cluster (analog of ``modified``,
                           reference src/report/mod.rs:133-137).

    The aggregation is a single shuffle on ``conv_id``; everything else is
    map-side. No Python touches a row.
    """
    cfg = cfg or LinkConfig()
    cap = int(cfg.turn_text_cap)

    # The two separator code points are STRIPPED from payload before the
    # concat: transcript text is arbitrary bytes (tool output routinely
    # carries control characters), and un-escaped separators would let a
    # single crafted turn canonicalize byte-equal to a different multi-turn
    # conversation — a false exact-dup merge (the exact path never re-reads
    # turn rows). Stripping is lossy only for texts that differ solely in
    # RS/US characters; framing stays uniquely decodable for everything
    # else. The DuckDB oracle applies the identical strip.
    def _clean(col):
        return F.regexp_replace(
            F.coalesce(col, F.lit("")), "[\\x1e\\x1f]", ""
        )

    turn_repr = F.concat(
        _clean(F.col("role")),
        F.lit(ROLE_SEP),
        F.substring(_clean(F.col("text")), 1, cap),
    )

    out = (
        # entry validation: a turn row with NULL conv_id belongs to no
        # conversation — grouping it would mint a NULL-keyed record that
        # every downstream `conv_id_a < conv_id_b` join silently drops
        # and the clusterer cannot key. Drop it here, once.
        transcripts
        .filter(F.col("conv_id").isNotNull())
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.length(F.coalesce(F.col("text"), F.lit(""))).alias("_chars"),
            turn_repr.alias("_turn"),
            F.col("ts"),
        )
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("_chars").cast("long").alias("total_chars"),
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(turn_idx, _turn))),"
                    " s -> s._turn)"
                ),
                TURN_SEP,
            ).alias("canon_text"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("max_ts"),
        )
    )
    if cfg.min_turns > 1:
        # min-size filter (reference src/pipeline/metadata.rs:32-37) — applied
        # post-agg because the predicate is on the aggregate.
        out = out.filter(F.col("n_turns") >= cfg.min_turns)
    return out


def turn_boilerplate(transcripts: DataFrame, min_convs: int = 3) -> DataFrame:
    """Boilerplate-turn report: exact (role, text) values repeated across
    ``min_convs`` or more DISTINCT conversations — system prompts, canned
    tool headers, templated greetings. In a training corpus these turns
    repeat millions of times and silently re-weight the loss; this is the
    turn-level analog of document exact-dedup.

    Returns (role, turn_md5, n_convs, n_turns, total_chars), one row per
    boilerplate turn value. Scale shape: turns reduce to 16-byte digests
    BEFORE the aggregation exchange, so the shuffle carries
    (role, digest, conv_id) — never turn text; both aggregates are
    partial-merge (map-side combine). Recover the text by joining
    ``turn_md5`` back onto the corpus.
    """
    keyed = transcripts.select(
        "conv_id", "role",
        F.md5(F.coalesce("text", F.lit(""))).alias("turn_md5"),
        F.length(F.coalesce("text", F.lit(""))).cast("long").alias("_chars"),
    )
    return (
        keyed.groupBy("role", "turn_md5")
        .agg(
            F.countDistinct("conv_id").alias("n_convs"),
            F.count("*").alias("n_turns"),
            F.sum("_chars").alias("total_chars"),
        )
        .filter(F.col("n_convs") >= F.lit(int(min_convs)))
    )


def strip_boilerplate(transcripts: DataFrame, min_convs: int = 3) -> DataFrame:
    """The curated corpus: ``transcripts`` minus every boilerplate turn
    (anti-join on (role, digest) — turn payloads never shuffle). Turn
    indices are NOT renumbered: downstream canonicalization orders by the
    original ``turn_idx``, so gaps are harmless and the surviving turns
    keep their provenance."""
    bp = turn_boilerplate(transcripts, min_convs).select(
        F.col("role").alias("_bp_role"), F.col("turn_md5").alias("_bp_md5")
    )
    keyed = transcripts.withColumn(
        "turn_md5", F.md5(F.coalesce("text", F.lit("")))
    )
    # null-safe on role: turn_boilerplate GROUPS null roles (they form a
    # boilerplate group like any other), so the anti-join must match them
    # too — a plain equality never matches NULL and would silently keep
    # every null-role boilerplate turn
    return (
        keyed.join(
            bp,
            F.col("role").eqNullSafe(F.col("_bp_role"))
            & (F.col("turn_md5") == F.col("_bp_md5")),
            "left_anti",
        )
        .select(*transcripts.columns)
    )


def explode_canonical(canonical: DataFrame) -> DataFrame:
    """Split ``canon_text`` back into ``(conv_id, turn_pos, role, text)``
    rows for invariant checking. ``turn_pos`` is the 0-based POSITION in
    the stable turn ordering — canon_text does not carry the original
    ``turn_idx``, which can have gaps (``strip_boilerplate`` documents
    that it never renumbers), so callers comparing against the source
    must rank the source by turn order, not join on raw indices."""
    return (
        canonical
        .select(
            "conv_id",
            F.posexplode(F.split("canon_text", TURN_SEP)).alias("turn_pos", "_turn"),
        )
        .select(
            "conv_id",
            "turn_pos",
            F.split("_turn", ROLE_SEP, 2).getItem(0).alias("role"),
            # text may itself be empty; element 1 always exists by construction
            F.split("_turn", ROLE_SEP, 2).getItem(1).alias("text"),
        )
    )
