"""Streaming exact dedup: first-arrival-wins within the watermark horizon,
state eviction beyond it (bounded-state contract)."""

import datetime as dt

from translink.streaming.dedup import streaming_exact_dedup

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _ev(eid, uid, minutes, etype="click", value=1.0, props='{"k": 1}'):
    return (eid, T0 + dt.timedelta(minutes=minutes), uid, etype, value, props)


def test_streaming_dedup_first_arrival_wins(spark, tmp_path):
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    # batch 1: two distinct events (one duplicated in-batch)
    b1 = spark.createDataFrame(
        [_ev(1, 10, 0), _ev(2, 10, 0), _ev(3, 20, 5)], schema
    )
    # batch 2 (later file): re-delivery of user 10's event inside the
    # horizon (dropped) + one genuinely new event
    b2 = spark.createDataFrame(
        [_ev(4, 10, 0), _ev(5, 30, 10)], schema
    )
    src = str(tmp_path / "dedup_src")
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_exact_dedup(
        stream, ["user_id", "event_type", "props"], watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory").queryName("sd_mem")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, ts FROM sd_mem").collect()
    got = sorted((r["user_id"], r["ts"]) for r in rows)
    # one row per distinct (user, type, props): users 10, 20, 30
    assert got == [
        (10, T0),
        (20, T0 + dt.timedelta(minutes=5)),
        (30, T0 + dt.timedelta(minutes=10)),
    ]


def test_digest_null_vs_empty(spark):
    from translink.streaming.dedup import digest_expr

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "id long, props string"
    ).select("id", digest_expr(["props"]).alias("d"))
    ds = {r["id"]: r["d"] for r in df.collect()}
    assert ds[1] != ds[2]          # null and empty must not collide
    assert len({*ds.values()}) == 3


def test_digest_is_injection_proof(spark):
    """Separator-bearing values and literal null-tag strings must NOT
    collide: ('a\\x1fb','c') vs ('a','b\\x1fc') forged equal digests under
    bare-separator framing; length prefixes make framing uniquely
    decodable for any byte content."""
    from translink.streaming.dedup import digest_expr

    rows = [
        ("a\x1fb", "c"),
        ("a", "b\x1fc"),
        ("a|3:b", "c"),      # attacks the new separator + prefix directly
        ("a", "3:b|c"),
        ("\x00null", "x"),   # literal old null tag vs a real null
        (None, "x"),
        ("n", "x"),          # literal new null tag vs a real null
    ]
    df = spark.createDataFrame(rows, "k1 string, k2 string")
    digests = [
        r["d"] for r in df.select(digest_expr(["k1", "k2"]).alias("d")).collect()
    ]
    assert len(set(digests)) == len(rows)
