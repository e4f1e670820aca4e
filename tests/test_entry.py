"""Driver-contract guard: every oracle-checked query must match DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.check_oracle import TABLES, rows_multiset

SF_DIR = "/root/testdata/sf0.001"


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
