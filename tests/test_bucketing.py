"""Bucketed co-located joins: the join and the per-key aggregation over
bucketed tables must contain NO Exchange in the physical plan (the write
already co-located the data), and results must match the plain join."""

import pytest
from pyspark.sql import functions as F

from translink.bucketing import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    left = spark.range(500).select(
        (F.col("id") % 50).alias("user_id"), F.col("id").alias("conv_id")
    )
    right = spark.range(200).select(
        (F.col("id") % 50).alias("user_id"), (F.col("id") * 10).alias("score")
    )
    write_bucketed(left, "tl_bkt_left", ["user_id"], 8, str(base / "l"))
    write_bucketed(right, "tl_bkt_right", ["user_id"], 8, str(base / "r"))
    yield left, right
    spark.sql("DROP TABLE IF EXISTS tl_bkt_left")
    spark.sql("DROP TABLE IF EXISTS tl_bkt_right")


def test_colocated_join_has_no_exchange(spark, bucketed):
    df = colocated_join(spark, "tl_bkt_left", "tl_bkt_right", ["user_id"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Broadcast" not in plan, plan


def test_colocated_join_matches_plain_join(spark, bucketed):
    left, right = bucketed
    got = sorted(
        tuple(r)
        for r in colocated_join(
            spark, "tl_bkt_left", "tl_bkt_right", ["user_id"]
        ).collect()
    )
    want = sorted(tuple(r) for r in left.join(right, ["user_id"]).collect())
    assert got == want and len(want) == 500 * 4


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    df = (
        spark.table("tl_bkt_left")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
