"""Typed JSON extraction: schema-driven projection, malformed-row verdicts."""

from translink.jsonops import parse_json_col


def test_parse_json_col(spark):
    rows = [
        (1, '{"k": 7, "tag": "a"}'),
        (2, '{"k": -3}'),                 # missing field -> null tag
        (3, 'not json at all'),           # malformed -> all nulls, row kept
        (4, None),                        # null payload -> all nulls
        (5, '{"k": "12"}'),               # type mismatch: NOT coerced
    ]
    df = spark.createDataFrame(rows, "event_id long, props string")
    got = {
        r["event_id"]: (r["k"], r["tag"])
        for r in parse_json_col(df, "k BIGINT, tag STRING").collect()
    }
    assert got[1] == (7, "a")
    assert got[2] == (-3, None)
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    # PERMISSIVE pins type fidelity: a JSON string is NOT silently coerced
    # to BIGINT (unlike a SQL CAST) — the mismatched parse yields nulls
    assert got[5] == (None, None)
    assert len(got) == 5                  # malformed rows are kept, not dropped


def test_parse_json_col_prefix_keeps_existing(spark):
    df = spark.createDataFrame([(1, "x", '{"k": 1}')],
                               "event_id long, event_type string, props string")
    out = parse_json_col(df, "k BIGINT", "props", prefix="props_")
    assert out.columns == ["event_id", "event_type", "props", "props_k"]


def test_parse_json_col_rejects_column_collision(spark):
    """A schema field matching an existing column (with the default empty
    prefix) must fail at plan-build time with the cause — the duplicate
    name otherwise surfaces later as AMBIGUOUS_REFERENCE."""
    import pytest as _pytest

    from translink.jsonops import parse_json_col

    df = spark.createDataFrame([(1, '{"ts": 5}')], "ts long, props string")
    with _pytest.raises(ValueError, match="collide"):
        parse_json_col(df, "ts BIGINT", "props")
    # a prefix resolves it
    out = parse_json_col(df, "ts BIGINT", "props", prefix="p_")
    assert out.columns == ["ts", "props", "p_ts"]


def test_props_oracle_survives_malformed_json(spark, tmp_path):
    """The event_props_stats ORACLE must tolerate a malformed props row the
    way Spark's PERMISSIVE from_json does (k -> NULL): DuckDB's
    json_extract_string RAISES on invalid JSON, so the SQL twin guards with
    json_valid. One bad row must mismatch NOTHING — both engines agree."""
    import duckdb

    import __spark_entry__ as entrymod
    from scripts.check_oracle import rows_multiset

    rows = [
        (1, None, 10, "view", 1.0, '{"k": 2}'),
        (2, None, 10, "view", 1.0, "not json at all"),
        (3, None, 10, "view", 1.0, None),
        (4, None, 11, "buy", 1.0, '{"other": true}'),
        (5, None, 11, "buy", 1.0, '{"k": -5}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{src}/events.parquet")

    sdf = entrymod.queries()["event_props_stats"](spark, src)
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{src}/events.parquet/*.parquet'"
    )
    res = con.sql(entrymod.oracle_sql()["event_props_stats"])
    drows = res.fetchall()
    assert rows_multiset(srows, sdf.columns) == rows_multiset(drows, res.columns)
    got = {r[0]: r for r in srows}
    assert got["view"][2] == 1  # only the valid {"k": 2} row counted
