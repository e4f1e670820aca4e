"""Custom stateful streaming operator: conversation assembly with
``applyInPandasWithState``.

The one ingest primitive the built-in streaming operators cannot express:
turns of a conversation arrive scattered across micro-batches, and the
pipeline wants ONE row per conversation — every turn, in order — emitted
the moment the conversation's end marker arrives. ``dropDuplicates*``
cannot accumulate payload, ``session_window`` cannot order it or emit on
a data-driven condition, and stream-stream joins pair rows rather than
fold them. This is exactly the case the engine's operator ladder
(SURVEY §7: built-in composition first, then Arrow-batched state) reserves
for ``applyInPandasWithState``: per-key state holding the turns seen so
far, Arrow-batched in and out, no per-row Python crossings.

Semantics (pinned by tests):
- state accumulates (turn_idx, role, text) per ``conv_id``;
- a turn with role == ``end_role`` closes the conversation: one output
  row with all PAYLOAD turns sorted by turn_idx (the marker itself is
  excluded), joined with the turn separator, and the state is dropped;
- duplicate deliveries of the same turn_idx resolve ORDER-FREE: the
  maximum (role, text) pair wins. Arrival-order rules ("last wins")
  cannot be replicated by a batch twin (a batch has no arrival order),
  so the resolution is defined to be commutative — the same winner
  regardless of how deliveries split across micro-batches; null text is
  normalized to '' before resolution;
- conversations never closed emit nothing (an optional processing-time
  timeout would flush them; the default is NoTimeout so availableNow
  drains are deterministic).

Scale shape: one shuffle on conv_id (the state key); state per key is the
conversation's own turns, evicted at close — the horizon the reference's
streaming walker keeps per file (``src/pipeline/streaming_hash.rs``),
generalized to out-of-order delivery.
"""

from __future__ import annotations

import re
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("transcript", StringType()),
        StructField("complete", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("idxs", StringType()),   # "|"-joined turn_idx ints
        StructField("roles", StringType()),  # unit-separator-joined
        StructField("texts", StringType()),
        # tombstone: conversation already emitted; re-delivered markers or
        # late turns are consumed silently so emission is exactly-once
        # under at-least-once delivery (the batch twin's .distinct())
        StructField("done", BooleanType()),
    ]
)

#: Unit separator for the packed state columns. Payload text is arbitrary
#: (tool output routinely carries control characters — see
#: translink/canonicalize.py), so BOTH twins strip the RS/US separators
#: from role and text before resolution: an un-escaped separator inside a
#: held turn would misalign the zip() on the next micro-batch and silently
#: scramble the reassembled transcript.
_US = "\x1f"
_SEP = "\n"
_STRIP = re.compile("[\x1e\x1f]")


def _assemble(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    turns = {}
    if state.exists:
        idxs_s, roles_s, texts_s, tombstone = state.get
        if tombstone:
            # already emitted: consume re-deliveries (late turns, duplicate
            # markers) without a second output row — without this, an
            # at-least-once source re-delivering the marker after
            # state.remove() re-emitted a spurious (conv_id, 0, "", True)
            # row that the batch twin (which dedups markers) never produces
            for _ in pdfs:
                pass
            return
        if idxs_s:  # a state row can hold zero turns (marker not yet seen)
            turns = {
                int(i): (r, t)
                for i, r, t in zip(
                    idxs_s.split("|"), roles_s.split(_US), texts_s.split(_US)
                )
            }

    done = False
    for pdf in pdfs:
        for row in pdf.itertuples():
            # null role / null turn_idx rows are dropped in BOTH twins
            # (the batch filter's null comparison drops them; an unordered
            # turn cannot be placed): without the guards the stream kernel
            # dies on max() against None or int(None/NaN)
            if row.role is None:
                continue
            role = _STRIP.sub("", str(row.role))
            if role == "__end__":
                done = True
                continue
            if row.turn_idx is None or row.turn_idx != row.turn_idx:
                continue
            idx = int(row.turn_idx)
            text = "" if row.text is None else _STRIP.sub("", str(row.text))
            cand = (role, text)
            prev = turns.get(idx)
            turns[idx] = cand if prev is None else max(prev, cand)

    if done:
        # tombstone instead of remove: one tiny row per closed conversation
        # buys exactly-once emission under re-delivery. A processing-time
        # timeout would bound tombstone state in a long-lived production
        # stream; NoTimeout keeps availableNow drains deterministic.
        state.update(("", "", "", True))
        ordered = sorted(turns.items())
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [len(ordered)],
                "transcript": [
                    _SEP.join(f"{r}: {t}" for _, (r, t) in ordered)
                ],
                "complete": [True],
            }
        )
    else:
        items = sorted(turns.items())
        state.update(
            (
                "|".join(str(i) for i, _ in items),
                _US.join(r for _, (r, _t) in items),
                _US.join(t for _, (_r, t) in items),
                False,
            )
        )


def assemble_conversations_stream(turns_stream: DataFrame) -> DataFrame:
    """Streaming conversation assembler: emits one row per conversation
    when its ``__end__``-role marker turn arrives. Input needs columns
    (conv_id, turn_idx, role, text)."""
    return (
        turns_stream.select("conv_id", "turn_idx", "role", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _assemble,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def assemble_conversations_batch(turns: DataFrame) -> DataFrame:
    """Batch twin: the same assembly as aggregations (used by the
    equivalence test). Only conversations WITH an end marker are emitted,
    and re-delivered turn_idx rows resolve to the same order-free winner
    (max (role, text), null text normalized to '') as the stream."""
    from pyspark.sql import functions as F

    clean_role = F.regexp_replace(F.col("role"), "[\\x1e\\x1f]", "")
    clean_text = F.regexp_replace(
        F.coalesce("text", F.lit("")), "[\\x1e\\x1f]", ""
    )
    payload = (
        turns
        .filter(F.col("role").isNotNull() & F.col("turn_idx").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            F.struct(
                clean_role.alias("role"), clean_text.alias("text")
            ).alias("_rt"),
        )
        .filter(F.col("_rt.role") != "__end__")
    )
    resolved = payload.groupBy("conv_id", "turn_idx").agg(
        F.max("_rt").alias("_rt")
    )
    ended = (
        turns
        .filter(
            F.regexp_replace(F.coalesce("role", F.lit("")), "[\\x1e\\x1f]", "")
            == "__end__"
        )
        .select("conv_id").distinct()
    )
    agg = resolved.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("turn_idx", F.col("_rt.role"), F.col("_rt.text"))
                    )
                ),
                lambda s: F.concat_ws("", s["role"], F.lit(": "), s["text"]),
            ),
            _SEP,
        ).alias("transcript"),
    )
    # a marker-only conversation (no payload) still closes: (0, "", True)
    return ended.join(agg, "conv_id", "left").select(
        "conv_id",
        F.coalesce("n_turns", F.lit(0)).cast("long").alias("n_turns"),
        F.coalesce("transcript", F.lit("")).alias("transcript"),
        F.lit(True).alias("complete"),
    )
