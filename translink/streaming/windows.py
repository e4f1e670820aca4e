"""Fixed-window (tumbling / hopping) event-time aggregation — batch and
stream twins over the ``events`` table.

Completes the engine's windowed-aggregation family: ``sessions`` covers
gap-based windows, this covers fixed-width ones (the rollup shape behind
rate metrics, traffic profiles, and per-interval corpus accounting).

Spark-first: the native ``window()`` expression assigns rows to buckets
inside the aggregation exec — no custom state, no UDF. Batch and streaming
share the SAME expression; streaming adds only a watermark so closed
windows are finalized (append mode) and their state evicted.

Boundary semantics (pinned by tests and the DuckDB ``time_bucket``
oracle): windows are half-open ``[start, end)`` and aligned to the epoch —
an event exactly on a boundary belongs to the LATER window.

Scale shape: one exchange keyed on (window, event_type) with map-side
partial aggregation; a window key's traffic, not the corpus, sizes its
partition. A hopping window (slide < width) multiplies each row into
width/slide buckets BEFORE the exchange — that fan-out is the operator's
contract, not a plan defect, and the library keeps tumbling as the
default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_stats(
    events: DataFrame,
    width_minutes: int = 10,
    slide_minutes: int | None = None,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """One row per (window, event type): event count and value sum.
    Tumbling by default; pass ``slide_minutes`` < width for hopping."""
    width = f"{int(width_minutes)} minutes"
    win = (
        F.window(F.col(ts_col), width)
        if slide_minutes is None
        else F.window(F.col(ts_col), width, f"{int(slide_minutes)} minutes")
    )
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(win.alias("w"), F.col(type_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            type_col,
            "n_events",
            "total_value",
        )
    )


def windowed_stream(
    events_stream: DataFrame,
    width_minutes: int = 10,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin: same aggregation over a ``readStream`` source plus a
    watermark, so a window is emitted exactly once (append mode) when the
    watermark passes its end, and its state is evicted. Events later than
    ``watermark`` are dropped — the documented late-data contract."""
    return windowed_event_stats(
        events_stream.withWatermark(ts_col, watermark),
        width_minutes,
        None,
        ts_col,
        type_col,
        value_col,
    )


def window_oracle_sql(width_minutes: int = 10) -> str:
    """ANSI twin via ``time_bucket``: DuckDB's default bucket origin
    (2000-01-01) sits a whole number of days from the epoch, and any
    minute width that divides a day yields identical boundaries to
    Spark's epoch-aligned windows — pinned by tests on boundary events.

    ``total_value`` uses the repo's deterministic-double-sum discipline
    (sorted fold + round 9), mirrored by the registered entry query; the
    plain ``windowed_event_stats`` API keeps the natural ``sum``."""
    return f"""
WITH e AS (
  SELECT time_bucket(INTERVAL {int(width_minutes)} MINUTE, ts) AS window_start,
         event_type, coalesce(value, 0.0) AS value
  FROM events WHERE ts IS NOT NULL
)
SELECT window_start,
       window_start + INTERVAL {int(width_minutes)} MINUTE AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(list_sum(list_sort(list(value))), 9) AS total_value
FROM e GROUP BY window_start, event_type
"""
