"""Fixed-window aggregation: batch semantics, half-open boundary pin,
time_bucket oracle parity, hopping fan-out, and the streaming twin's
append-mode equivalence with watermark eviction."""

import datetime as dt
import os

import duckdb

from translink.streaming.windows import (
    window_oracle_sql, windowed_event_stats, windowed_stream,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)  # on a 10-minute boundary


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _events(spark):
    rows = [
        (1, _mins(0), "click", 1.0),    # window [12:00, 12:10)
        (2, _mins(9), "click", 2.0),    # same window
        (3, _mins(10), "click", 4.0),   # boundary: belongs to [12:10, 12:20)
        (4, _mins(5), "view", 8.0),     # separate type, same interval
        (5, _mins(25), "click", 16.0),  # [12:20, 12:30)
    ]
    return spark.createDataFrame(
        [(e, ts, 7, t, v, "{}") for e, ts, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).cache()


def test_batch_windows_and_boundary(spark):
    got = {
        (r["window_start"], r["event_type"]): (
            r["window_end"], r["n_events"], r["total_value"]
        )
        for r in windowed_event_stats(_events(spark), 10).collect()
    }
    assert got == {
        (_mins(0), "click"): (_mins(10), 2, 3.0),
        (_mins(0), "view"): (_mins(10), 1, 8.0),
        (_mins(10), "click"): (_mins(20), 1, 4.0),   # boundary event moved up
        (_mins(20), "click"): (_mins(30), 1, 16.0),
    }


def test_hopping_window_fan_out(spark):
    # width 10, slide 5: each event lands in exactly 2 windows
    out = windowed_event_stats(_events(spark), 10, slide_minutes=5)
    assert out.agg({"n_events": "sum"}).collect()[0][0] == 2 * 5


def test_oracle_parity(spark):
    events = _events(spark)
    con = duckdb.connect()
    con.register("events", events.toPandas())
    ora = sorted(tuple(r) for r in con.execute(window_oracle_sql(10)).fetchall())

    import tempfile

    import __spark_entry__ as E

    d = tempfile.mkdtemp()
    events.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = sorted(
        tuple(r) for r in E.queries()["event_window_stats"](spark, d).collect()
    )
    assert got == ora


def test_stream_matches_batch(spark, tmp_path):
    events = _events(spark)
    src = str(tmp_path / "win_src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    sentinel = spark.createDataFrame(
        [(999, T0 + dt.timedelta(days=10), 999, "flush", 0.0, "{}")],
        events.schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = windowed_stream(stream, width_minutes=10, watermark="1 minute")
    qname = "test_windows_mem"
    query = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
        if r["event_type"] != "flush"
    }
    want = {
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in windowed_event_stats(events, 10).collect()
    }
    assert got == want
