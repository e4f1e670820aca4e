"""Event-time interval join: inclusive bounds at both edges, key
isolation, and stream-stream equivalence with the batch twin."""

import datetime as dt

from translink.streaming.joins import interval_join_events

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _events(spark):
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: purchase at 12:60 — views probe the horizon edges
        (1, 1, _mins(0), "view"),             # exactly 60 min before: included
        (2, 1, _mins(0) - us, "view"),        # 60 min + 1us: excluded
        (3, 1, _mins(30), "view"),            # inside
        (4, 1, _mins(60), "view"),            # equal ts: included
        (5, 1, _mins(61), "view"),            # after the purchase: excluded
        (6, 1, _mins(60), "purchase"),
        # user 2: same timestamps, no cross-user leakage
        (7, 2, _mins(30), "view"),
        (8, 2, _mins(200), "purchase"),       # view too old
    ]
    return spark.createDataFrame(
        [(e, u, ts, t, 1.0, "{}") for e, u, ts, t in rows],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    ).cache()


def _sides(events):
    from pyspark.sql import functions as F

    return (
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "view"),
    )


def test_interval_join_bounds(spark):
    purchases, views = _sides(_events(spark))
    got = {
        (r["left_id"], r["right_id"]): r["gap_us"]
        for r in interval_join_events(purchases, views, 60).collect()
    }
    assert got == {
        (6, 1): 60 * 60 * 1_000_000,
        (6, 3): 30 * 60 * 1_000_000,
        (6, 4): 0,
    }


def test_interval_join_plan_is_broadcast_free(spark):
    purchases, views = _sides(_events(spark))
    plan = (
        interval_join_events(purchases, views, 60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" not in plan
    assert "CartesianProduct" not in plan


def test_stream_stream_join_matches_batch(spark, tmp_path):
    events = _events(spark)
    src = str(tmp_path / "join_src")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    def side(event_type):
        from pyspark.sql import functions as F

        return (
            spark.readStream.schema(events.schema).parquet(src)
            .filter(F.col("event_type") == event_type)
        )

    out = interval_join_events(
        side("purchase"), side("view"), 60,
        left_watermark="1 minute", right_watermark="1 minute",
    )
    qname = "test_stream_join_mem"
    query = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(120)
    got = {
        (r["left_id"], r["right_id"], r["gap_us"])
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    }
    purchases, views = _sides(events)
    want = {
        (r["left_id"], r["right_id"], r["gap_us"])
        for r in interval_join_events(purchases, views, 60).collect()
    }
    assert got == want and len(want) == 3


def test_stream_join_state_eviction_is_derived(spark, tmp_path):
    """The streaming physical plan must carry a RIGHT-side state-cleanup
    predicate — i.e. Spark derived a state watermark from the interval
    bound. A timestampdiff()-style bound regresses to 'right = null'
    (unbounded right buffer); this pins the interval-arithmetic form."""
    events = _events(spark)
    src = str(tmp_path / "evict_src")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    def side(event_type):
        from pyspark.sql import functions as F

        return (
            spark.readStream.schema(events.schema).parquet(src)
            .filter(F.col("event_type") == event_type)
        )

    out = interval_join_events(
        side("purchase"), side("view"), 60,
        left_watermark="1 minute", right_watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory").queryName("test_evict_mem")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    plan = q._jsq.explainInternal(True)
    import re

    cleanup = re.search(r"state cleanup \[(.*?)\]", plan, re.S)
    assert cleanup, plan
    assert "right = null" not in cleanup.group(1), cleanup.group(1)
    assert "right value predicate" in cleanup.group(1), cleanup.group(1)
