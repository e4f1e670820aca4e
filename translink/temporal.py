"""Temporal (as-of) join — attach the latest right-side row at-or-before
each left row's timestamp, per key, without a join explosion.

Spark has no native ASOF join; the naive formulation (range join + window
to keep the max-ts match) shuffles every candidate pair. This operator
uses the canonical scalable encoding instead: tag both sides, union them,
and run ONE partitioned sort with ``last(..., ignorenulls=True)`` carrying
the right side's payload forward in event-time order. Cost is a single
shuffle + sort over left+right rows — no pair blowup, no broadcast — and
the partition key is the join key, so the window is a linear scan per
key, never quadratic in ties (ties are pre-deduplicated by the caller).

Reference analog: the reference's streaming pipeline orders chunks per
file and folds state forward in offset order
(``src/pipeline/streaming_hash.rs``); this is the same fold, generalized
to event-time per key and run as a Spark window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload_cols`` from the
    newest ``right`` row with ``right.ts <= left.ts`` (``<`` when
    ``strict``) sharing ``keys``. Unmatched left rows keep nulls.

    ``right`` must be deterministic per (keys, ts): if several right rows
    share a key+timestamp, pre-aggregate before calling (the query layer
    keeps ``max(event_id)``) — otherwise "the" latest row is undefined in
    ANY engine, not just this one.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    # At equal ts the right row must sort BEFORE the left row for <=
    # semantics (the left row sees it), AFTER it for strict <.
    left_tag, right_tag = (1, 0) if not strict else (0, 1)

    # NULL-ts right rows would sort FIRST (ascending = nulls first) and
    # their payload would be carried into every left row of the key by
    # last(..., ignorenulls=True) — a fabricated match for left rows that
    # have no real predecessor. "At or before" is undefined for a null
    # timestamp, so such rows cannot participate.
    right = right.filter(F.col(ts_col).isNotNull())

    lhs = left.withColumn("_tag", F.lit(left_tag))
    rhs = right.select(
        *keys,
        ts_col,
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    ).withColumn("_tag", F.lit(right_tag))

    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}_c")
        for c in payload_cols
    ]
    return (
        unioned.select("*", *carried)
        .filter(F.col("_tag") == left_tag)
        .select(
            *left.columns,
            *[
                F.col(f"{prefix}{c}_c").alias(f"{prefix}{c}")
                for c in payload_cols
            ],
        )
    )


def event_asof_view_before_purchase(events: DataFrame) -> DataFrame:
    """For every ``purchase`` event: the newest ``view`` event at-or-before
    it by the same user, as ``(event_id, user_id, ts, view_event_id,
    view_ts, gap_us)``. ``gap_us`` is an exact integer microsecond delta
    (no float arithmetic, no second-truncation ambiguity vs the oracle).

    View rows are collapsed to one per (user_id, ts) — keeping
    ``max(event_id)`` — so the as-of winner is well-defined under ties in
    every engine.
    """
    ev = events.filter(F.col("ts").isNotNull())
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("vid"))
        .select("user_id", "ts", "vid", F.col("ts").alias("view_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        keys=["user_id"],
        ts_col="ts",
        payload_cols=["vid", "view_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_vid").alias("view_event_id"),
        F.col("asof_view_ts").alias("view_ts"),
        F.expr("timestampdiff(MICROSECOND, asof_view_ts, ts)")
        .cast("long")
        .alias("gap_us"),
    )


def rolling_event_stats(events: DataFrame, hours: int = 24) -> DataFrame:
    """Per event: count and value-sum of the same user's events in the
    trailing ``hours`` window, INCLUSIVE at both ends (``[ts - h, ts]`` —
    an event exactly ``hours`` old still counts; RANGE frames in every SQL
    engine share this bound, which the tests pin).

    The rolling sum is folded in sorted order and rounded (the repo's
    deterministic-double-sum discipline) so it cannot drift from a SQL
    oracle that sums the same frame in a different order.

    Scale shape: one exchange on ``user_id``, one per-user event-time
    sort; each frame's cost is that user's activity inside the horizon,
    not the corpus. A pathologically hot key concentrates its own
    traffic — the same bound as every per-key window in the engine — and
    the horizon caps the frame, so state never grows with history.
    """
    # Microsecond-granular range key: truncating to seconds would make
    # sub-second neighbors spurious RANGE peers (and disagree with any
    # interval-precision SQL oracle).
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        )
        .rangeBetween(-int(hours) * 3600 * 1_000_000, 0)
    )
    n_col, sum_col = f"n_{int(hours)}h", f"sum_{int(hours)}h"
    base = events.filter(F.col("ts").isNotNull()).select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("long").alias(n_col),
        F.array_sort(
            F.collect_list(F.coalesce("value", F.lit(0.0))).over(w)
        ).alias("_rv"),
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        n_col,
        F.round(
            F.expr("aggregate(_rv, cast(0.0 as double), (acc, v) -> acc + v)"),
            9,
        ).alias(sum_col),
    )
