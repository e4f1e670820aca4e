"""Driver-contract guard: every oracle-checked query must match DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01)."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.check_oracle import TABLES, rows_multiset

SF_DIR = "/root/testdata/sf0.001"
# data-dependent oracle twins (FS EM fit) must read the corpus THIS test
# compares on, not the driver's sf0.01 default
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(srows) >= 0  # rows-only contract: runs and returns a frame
        return
    res = duck.sql(oracles[name])
    drows = res.fetchall()
    assert len(srows) == len(drows), f"row count {len(srows)} vs {len(drows)}"
    assert rows_multiset(srows, sdf.columns) == rows_multiset(drows, res.columns)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"conv_id", "cluster_id", "cluster_size"}
    # planted _dup conversations must share a cluster with their source
    by_id = {r["conv_id"]: r["cluster_id"] for r in rows}
    dups = [c for c in by_id if c.endswith("_dup")]
    assert dups
    assert all(by_id[c] == by_id[c[:-4]] for c in dups)


def test_transcript_derivation_parity_on_hostile_events(spark, tmp_path):
    """Cross-engine parity on inputs the shipped fixtures don't exercise:
    a turn text LONGER than turn_text_cap (Spark caps per turn; the SQL
    canonical CTE must apply the identical substr), an event with NULL
    ts (Spark windows sort nulls FIRST, DuckDB's default is LAST — the
    ORDER BY must pin NULLS FIRST or every later rn shifts), and an event
    with NULL user_id (Spark's concat null-propagates to a NULL conv_id
    while DuckDB's concat treats NULL as '' — both derivations must DROP
    the row instead)."""
    import datetime as dt

    from translink.canonicalize import canonicalize

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    big = "x" * (entrymod.TURN_TEXT_CAP + 500)
    for i in range(6):
        rows.append((7, i * 3, "view", f"p{i}", t0 + dt.timedelta(minutes=i)))
    rows.append((7, 18, "view", big, t0 + dt.timedelta(minutes=10)))
    rows.append((7, 21, "view", "after-null", None))  # NULL ts event
    rows.append((None, 24, "view", "orphan", t0))  # NULL user_id event
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, props string, ts timestamp"
    )
    src = str(tmp_path / "hostile")
    ev.write.mode("overwrite").parquet(f"{src}/events.parquet")

    got = {
        r["conv_id"]: (r["n_turns"], r["canon_text"])
        for r in canonicalize(
            entrymod.derive_transcripts(spark, src), entrymod.CFG
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{src}/events.parquet/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"WITH {entrymod._TRANSCRIPTS_SQL} "
            "SELECT conv_id, n_turns, canon_text FROM canonical"
        ).fetchall()
    }
    assert got == want
    # the cap was actually exercised
    assert any(len(c) < len(big) and "xxxx" in c for _, c in got.values())
    # the orphan (NULL user_id) event was dropped, not NULL-keyed
    assert None not in got
    assert not any("orphan" in c for _, c in got.values())
