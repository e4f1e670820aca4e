"""Connected components: chain, star, two components, determinism.

Replaces the reference's greedy single-link sweep
(``src/pipeline/stats.rs:296-326``) with true transitive closure; these are
the stage behavioral tests from SURVEY §5.2.
"""

from pyspark.sql import functions as F

from translink.clustering import (
    clusters_with_singletons,
    connected_components,
    exact_clusters,
    exact_edges,
)
from translink.canonicalize import canonicalize
from translink.config import LinkConfig
from translink.signatures import with_exact_digest


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["conv_id"]: r["cluster_id"]
        for r in connected_components(df, LinkConfig()).collect()
    }


def test_chain(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert got == {x: "a" for x in "abcde"}


def test_star(spark):
    got = _cc(spark, [("m", "a"), ("m", "b"), ("m", "c")])
    assert got == {"a": "a", "b": "a", "c": "a", "m": "a"}


def test_two_components_and_duplicate_edges(spark):
    got = _cc(spark, [("a", "b"), ("b", "a"), ("x", "y"), ("y", "z"), ("x", "z")])
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x", "z": "x"}


def test_long_chain_converges(spark):
    n = 40
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n000"}
    assert len(got) == n + 1


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert connected_components(df, LinkConfig()).count() == 0


def test_singletons_union(spark):
    ids = spark.createDataFrame([("a",), ("b",), ("c",)], "conv_id string")
    comp = spark.createDataFrame([("a", "a"), ("b", "a")], "conv_id string, cluster_id string")
    got = {
        r["conv_id"]: r["cluster_id"]
        for r in clusters_with_singletons(ids, comp).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "c"}


def test_exact_clusters_group_structure(spark, tiny):
    """Planted exact-dup groups are found whole by the digest path."""
    signed = with_exact_digest(canonicalize(tiny["transcripts"]))
    ec = exact_clusters(signed)
    # every exact cluster has >= 2 members and one distinct cluster id
    sizes = ec.groupBy("cluster_id").count()
    assert sizes.filter(F.col("count") < 2).count() == 0
    # the hot-key group (>= 20 identical convs) is one cluster
    hot = ec.filter(F.col("conv_id").startswith("hot_"))
    assert hot.select("cluster_id").distinct().count() == 1
    assert hot.count() >= 20


def test_exact_edges_are_linear(spark, tiny):
    signed = with_exact_digest(canonicalize(tiny["transcripts"]))
    ec = exact_clusters(signed)
    ee = exact_edges(signed)
    n_members = ec.count()
    n_groups = ec.select("cluster_id").distinct().count()
    assert ee.count() == n_members - n_groups  # n-1 edges per group


def test_random_graphs_match_union_find(spark):
    """Property test: on seeded random graphs the large-star/small-star loop
    must agree with a reference union-find (min-id labels) — covers shapes
    (cycles, cross-links, disconnected blobs) the fixed fixtures don't."""
    import random

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # relabel every member to its component minimum
        members = {}
        for x in list(parent):
            members.setdefault(find(x), []).append(x)
        return {x: root for root, xs in members.items()
                for x in xs}

    rng = random.Random(1234)
    for trial in range(4):
        n = rng.choice([12, 40, 90])
        m = rng.randint(n // 2, 2 * n)
        edges = [
            (f"c{rng.randrange(n):03d}", f"c{rng.randrange(n):03d}")
            for _ in range(m)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        want = union_find_labels(edges)
        got = _cc(spark, edges)
        assert got == want, f"trial {trial} (n={n}, m={m})"
