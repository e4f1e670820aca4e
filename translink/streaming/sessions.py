"""Event-time sessionization over the ``events`` table — batch and stream.

The one event-time operator the engine exposes (the reference has no
event-time logic, SURVEY §2.9; this extends the T-family with the watermark
+ windowed-aggregation pattern the brief's training-data pipelines need —
e.g. sessionizing user interaction logs before transcript assembly).

Spark-first: the native ``session_window`` expression handles gap-merging
inside the aggregation exec — no custom state store, no
``applyInPandasWithState``, no per-row Python. Batch and streaming share the
SAME aggregation expression; the streaming variant only adds a watermark
(late-event bound) and emits finalized sessions in append mode.

Boundary semantics (pinned by the DuckDB oracle and tests): Spark merges
an event into the running session when its gap to the previous event is
``<= gap`` — an event EXACTLY ``gap`` after the previous one stays in the
SAME session; only a strictly larger gap starts a new one.

Scale shape: one shuffle on ``user_id`` (the session key); the window merge
is per-key linear. Skewed users are bounded by the same argument as every
grouping stage — a key's traffic, not the corpus, sizes its partition; in
streaming, state is evicted at the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize_events(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch sessionization: one row per (user, session) with start/end,
    event count and value sum. ``session_window`` merges events closer than
    ``gap_minutes`` into one window per key."""
    gap = f"{int(gap_minutes)} minutes"
    return (
        events.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            key_col, "session_start", "session_end", "n_events", "total_value"
        )
    )


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin: same aggregation expression over a ``readStream``
    source, plus a watermark so state for closed sessions is evicted and
    append-mode emission is legal. Events later than ``watermark`` are
    dropped (the documented late-data contract)."""
    return sessionize_events(
        events_stream.withWatermark(ts_col, watermark),
        gap_minutes, ts_col, key_col, value_col,
    )


def session_oracle_sql(gap_minutes: int = 30) -> str:
    """Gaps-and-islands ANSI twin: a new island starts where the gap to the
    previous event is STRICTLY greater than gap (matching session_window's
    closed merge bound, pinned by tests/test_sessions.py).

    ``total_value`` is folded in SORTED order and rounded (the repo's
    standard deterministic-double-sum discipline) — the oracle-checked
    entry query mirrors the same fold; the plain ``sessionize_events`` API
    keeps the natural ``sum`` (order-free only up to double rounding)."""
    return f"""
WITH e AS (
  SELECT user_id, ts, coalesce(value, 0.0) AS value
  FROM events WHERE ts IS NOT NULL
),
d AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {int(gap_minutes)} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM d
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(list_sum(list_sort(list(value))), 9) AS total_value
FROM s GROUP BY user_id, session_id
"""
