"""Stream-stream interval join — correlate two live event streams within
a bounded event-time window (e.g. every purchase with the same user's
views from the preceding hour), with state bounded by watermarks.

Spark-first: Structured Streaming's native stream-stream inner join. The
join is legal and state-bounded because BOTH sides carry a watermark and
the join condition carries an event-time interval bound — Spark derives
the state-eviction horizon from the two, so neither side's buffer grows
with history. No custom state store, no ``applyInPandasWithState``.

Scale shape: both streams shuffle once on the join key; per-key state is
(key traffic x horizon), never corpus-sized. The SAME function body
serves the batch twin (pass batch DataFrames, watermarks skipped), which
the tests use for stream-vs-batch equivalence — the repo's standard twin
discipline (sessions, windows, dedup all follow it).

The interval bound is half-open at the lower edge and inclusive at the
upper: ``left.ts - horizon <= right.ts <= left.ts`` with equality kept on
both checks, matching the batch SQL a range predicate would write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_events(
    left: DataFrame,
    right: DataFrame,
    horizon_minutes: int = 60,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
) -> DataFrame:
    """Inner-join ``left`` rows to every ``right`` row of the same key
    whose timestamp falls in ``[left.ts - horizon, left.ts]``. Pass
    watermarks when the inputs are streams (both are REQUIRED by Spark
    for state eviction); leave them None for the batch twin.

    Output: left's ``event_id`` as ``left_id``, right's as ``right_id``,
    both timestamps, and the exact microsecond gap.
    """
    lhs = left.select(
        F.col(key_col).alias("_k"),
        F.col("event_id").alias("left_id"),
        F.col(ts_col).alias("left_ts"),
    )
    rhs = right.select(
        F.col(key_col).alias("_rk"),
        F.col("event_id").alias("right_id"),
        F.col(ts_col).alias("right_ts"),
    )
    if left_watermark is not None:
        lhs = lhs.withWatermark("left_ts", left_watermark)
    if right_watermark is not None:
        rhs = rhs.withWatermark("right_ts", right_watermark)

    # The lower bound MUST be written as interval arithmetic on the two
    # timestamp columns: Spark's StreamingJoinHelper derives the state
    # watermark (right-side eviction) only from range predicates it can
    # solve for each side — a timestampdiff() form joins correctly but
    # leaves the right buffer growing forever (verified on the executed
    # plan: "state cleanup [... right = null ]").
    cond = (
        (lhs["_k"] == rhs["_rk"])
        & (rhs["right_ts"] <= lhs["left_ts"])
        & (
            rhs["right_ts"]
            >= lhs["left_ts"] - F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES")
        )
    )
    return lhs.join(rhs, cond, "inner").select(
        F.col("_k").alias(key_col),
        "left_id",
        "left_ts",
        "right_id",
        "right_ts",
        F.expr("timestampdiff(MICROSECOND, right_ts, left_ts)")
        .cast("long")
        .alias("gap_us"),
    )
