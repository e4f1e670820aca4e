"""Event-time sessionization: batch semantics, boundary pin, oracle parity,
and the streaming twin's append-mode equivalence with watermark eviction."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from translink.streaming.sessions import (
    session_oracle_sql, sessionize_events, sessionize_stream,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions — 0,10,25 | 70,80
        (1, 1, _mins(0), 1.0), (2, 1, _mins(10), 2.0), (3, 1, _mins(25), 3.0),
        (4, 1, _mins(70), 4.0), (5, 1, _mins(80), 5.0),
        # user 2: one event
        (6, 2, _mins(5), 10.0),
        # user 3: boundary pin — second event EXACTLY 30 min after the first
        # (Spark merges at <= gap; only a strictly larger gap splits)
        (7, 3, _mins(0), 1.0), (8, 3, _mins(30), 1.0),
        # user 4: just OVER the gap => two sessions
        (9, 4, _mins(0), 1.0), (10, 4, _mins(31), 1.0),
    ]
    return spark.createDataFrame(
        [(e, u, ts, "click", v, "{}") for e, u, ts, v in rows],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    ).cache()


def test_batch_sessions(events):
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["total_value"])
        for r in sessionize_events(events, gap_minutes=30).collect()
    )
    assert got == [
        (1, _mins(0), 3, 6.0),
        (1, _mins(70), 2, 9.0),
        (2, _mins(5), 1, 10.0),
        (3, _mins(0), 2, 2.0),    # boundary: exactly gap stays in-session
        (4, _mins(0), 1, 1.0),    # 31 min > gap: two sessions
        (4, _mins(31), 1, 1.0),
    ]


def test_oracle_parity(events):
    """The gaps-and-islands SQL and the session_window query agree row-for-
    row (same check the driver runs at sf0.01, here on gap-adversarial
    data)."""
    import __spark_entry__ as E

    pdf = events.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    ora = sorted(tuple(r) for r in con.execute(session_oracle_sql(30)).fetchall())

    # reproduce the registered query's deterministic fold on this fixture
    spark = events.sparkSession
    q = E.queries()["event_sessions"]
    import os, tempfile
    d = tempfile.mkdtemp()
    events.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = sorted(tuple(r) for r in q(spark, d).collect())
    assert got == ora


def test_stream_matches_batch(spark, events, tmp_path):
    """availableNow file stream + watermark, append mode: every session whose
    end the watermark passed is emitted exactly once and matches batch. A
    sentinel event far in the future (separate micro-batch via
    maxFilesPerTrigger=1) drives the watermark past all real sessions."""
    src = str(tmp_path / "stream_src")
    # file 1: the real events; file 2: the sentinel that advances the watermark
    events.coalesce(1).write.mode("overwrite").parquet(src)
    sentinel = spark.createDataFrame(
        [(999, 999, T0 + dt.timedelta(days=10), "flush", 0.0, "{}")],
        events.schema,
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
    qname = "test_sessions_mem"
    query = (
        sessions.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(availableNow=True).start()
    )
    query.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
        if r["user_id"] != 999
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_events(events, gap_minutes=30).collect()
    }
    assert got == want
