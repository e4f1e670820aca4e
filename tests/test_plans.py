"""North-rule plan guard: no broadcast joins anywhere in the engine.

The reference is a deliberately broadcast-free partitioned design (SURVEY
P12); the north rule requires "broadcast-free sort-merge self-join" for
candidate generation. This sweeps EVERY registered driver query's physical
plan at sf0.001 and fails if a broadcast join (or an unexpected cartesian
product) ever creeps in — e.g. via a future Catalyst default change or a
carelessly added dimension join.
"""

import pytest

import __spark_entry__ as entry

#: Queries whose plans legitimately contain a cross product: the exact
#: ANN baselines are CONTRACTED to be query x corpus brute force (the
#: correctness oracle for the LSH/IVF scale paths).
#: queries whose contract IS the exact cross product (documented O(n^2)
#: oracle baselines; every one has a bucketed scale twin)
CROSS_OK = {"ann_cosine_topk", "knn_label_vote", "emb_dup_pairs",
            "emb_dup_clusters"}

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_query_plan_is_broadcast_free(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    plan = _plan(spark, df)
    assert "BroadcastHashJoin" not in plan, f"{name}:\n{plan}"
    assert "BroadcastExchange" not in plan, f"{name}:\n{plan}"
    if name not in CROSS_OK:
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}:\n{plan}"
