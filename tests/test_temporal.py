"""As-of join: semantics (<= vs strict <), null handling for unmatched
rows, tie determinism, and the union+window plan shape (one exchange,
no join operator, no broadcast)."""

import datetime as dt

from pyspark.sql import functions as F

from translink.temporal import asof_join, event_asof_view_before_purchase

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _sides(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _mins(10)),   # matches right at 5
            (2, 100, _mins(20)),   # matches right at 20 (equal ts, <= semantics)
            (3, 100, _mins(3)),    # before any right row -> null
            (4, 200, _mins(50)),   # user with no right rows at all -> null
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (11, 100, _mins(5)),
            (12, 100, _mins(20)),
        ],
        "rid long, user_id long, ts timestamp",
    )
    return left, right


def test_asof_join_le_semantics(spark):
    left, right = _sides(spark)
    got = {
        r["event_id"]: r["asof_rid"]
        for r in asof_join(
            left, right, keys=["user_id"], ts_col="ts", payload_cols=["rid"]
        ).collect()
    }
    assert got == {1: 11, 2: 12, 3: None, 4: None}


def test_asof_join_strict_excludes_equal_ts(spark):
    left, right = _sides(spark)
    got = {
        r["event_id"]: r["asof_rid"]
        for r in asof_join(
            left, right, keys=["user_id"], ts_col="ts",
            payload_cols=["rid"], strict=True,
        ).collect()
    }
    # event 2 (ts == right ts 20) now falls back to the row at ts 5
    assert got == {1: 11, 2: 11, 3: None, 4: None}


def test_asof_join_keeps_every_left_row_and_columns(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, keys=["user_id"], ts_col="ts",
                    payload_cols=["rid"])
    assert out.columns == ["event_id", "user_id", "ts", "asof_rid"]
    assert out.count() == left.count()


def test_asof_plan_is_one_window_no_join(spark):
    left, right = _sides(spark)
    plan = asof_join(
        left, right, keys=["user_id"], ts_col="ts", payload_cols=["rid"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan           # union+window, never a join operator
    assert "Broadcast" not in plan
    assert plan.count("Exchange") == 1  # one shuffle on the key, total


def test_event_asof_view_before_purchase(spark):
    events = spark.createDataFrame(
        [
            (1, 7, _mins(0), "view", 0.0, "{}"),
            (2, 7, _mins(0), "view", 0.0, "{}"),    # tie on (user, ts): max id wins
            (3, 7, _mins(9), "purchase", 1.0, "{}"),
            (4, 7, _mins(30), "view", 0.0, "{}"),
            (5, 7, _mins(30), "purchase", 1.0, "{}"),  # equal-ts view counts
            (6, 8, _mins(5), "purchase", 1.0, "{}"),   # user with no views
            (7, 9, _mins(1), "click", 0.0, "{}"),      # other types ignored
        ],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    rows = {
        r["event_id"]: (r["view_event_id"], r["gap_us"])
        for r in event_asof_view_before_purchase(events).collect()
    }
    assert rows == {
        3: (2, 9 * 60 * 1_000_000),
        5: (4, 0),
        6: (None, None),
    }


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check against an independent reference
    implementation (pandas.merge_asof, backward direction) over seeded
    random event sets, both <= and strict < semantics. Right sides are
    pre-deduplicated per (key, ts) — the operator's documented contract."""
    import random

    import pandas as pd

    rng = random.Random(20260818)
    for trial in range(5):
        strict = trial % 2 == 1
        left_rows = [
            (i, rng.randrange(6), _mins(rng.randrange(0, 500)))
            for i in range(120)
        ]
        right_rows = [
            (1000 + i, rng.randrange(6), _mins(rng.randrange(0, 500)))
            for i in range(80)
        ]
        left = spark.createDataFrame(
            left_rows, "event_id long, user_id long, ts timestamp"
        )
        right_all = pd.DataFrame(right_rows, columns=["rid", "user_id", "ts"])
        # contract: one right row per (key, ts), max id wins
        right_pd = (
            right_all.groupby(["user_id", "ts"], as_index=False)["rid"].max()
        )
        right = spark.createDataFrame(right_pd)

        got = {
            r["event_id"]: r["asof_rid"]
            for r in asof_join(
                left, right, keys=["user_id"], ts_col="ts",
                payload_cols=["rid"], strict=strict,
            ).collect()
        }

        left_pd = pd.DataFrame(
            left_rows, columns=["event_id", "user_id", "ts"]
        ).sort_values("ts", kind="mergesort")
        merged = pd.merge_asof(
            left_pd,
            right_pd.sort_values("ts", kind="mergesort"),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=not strict,
        )
        want = {
            int(r.event_id): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }
        assert got == want, f"trial {trial} (strict={strict})"


def test_rolling_event_stats_boundaries(spark):
    from translink.temporal import rolling_event_stats

    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: probe the inclusive trailing bound at exactly 1h
        (1, 1, T0, 1.0),
        (2, 1, T0 + h, 2.0),            # exactly 1h later: includes event 1
        (3, 1, T0 + h + us, 4.0),       # 1h + 1us after T0: event 1 ages out
        # user 2: same-timestamp peers count each other (RANGE semantics)
        (4, 2, T0, 8.0),
        (5, 2, T0, 16.0),
        # sub-second distinction: 1h + 0.5s after event 6 -> excluded
        (6, 3, T0, 1.0),
        (7, 3, T0 + h + dt.timedelta(milliseconds=500), 2.0),
    ]
    events = spark.createDataFrame(
        [(e, u, ts, "click", v, "{}") for e, u, ts, v in rows],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    got = {
        r["event_id"]: (r["n_1h"], r["sum_1h"])
        for r in rolling_event_stats(events, hours=1).collect()
    }
    assert got == {
        1: (1, 1.0),
        2: (2, 3.0),    # inclusive: the exactly-1h-old event still counts
        3: (2, 6.0),    # event 1 aged out, events 2+3 remain
        4: (2, 24.0),   # RANGE peers: both same-ts rows see each other
        5: (2, 24.0),
        6: (1, 1.0),
        7: (1, 2.0),    # 1h + 500ms: microsecond key keeps it out
    }


def test_asof_join_ignores_null_ts_right_rows(spark):
    """A right row with NULL ts must not participate: 'at or before' is
    undefined for a null timestamp. Before the fix it sorted FIRST
    (ascending = nulls first) and its payload was carried into every
    otherwise-unmatched left row — a fabricated match."""
    left = spark.createDataFrame(
        [(1, 100, _mins(3))],  # before any real right row -> must be null
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(99, 100, None), (11, 100, _mins(5))],
        "rid long, user_id long, ts timestamp",
    )
    row = asof_join(
        left, right, keys=["user_id"], ts_col="ts", payload_cols=["rid"]
    ).first()
    assert row["asof_rid"] is None
