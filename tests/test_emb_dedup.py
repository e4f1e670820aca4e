"""Embedding-cosine near-duplicate dedup: exact baseline, LSH recall at the
operator's design regime (planted near-dups, tau >= 0.9), clustering
transitivity, and the zero-vector hot-key guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from translink.ann import (
    cosine_dup_clusters,
    cosine_dup_pairs,
    cosine_dup_pairs_lsh,
)

DIM = 64


def _planted(spark, n_dups=40, seed=7):
    """sf0.001 embeddings + a near-identical copy of every (vec_id % 12 == 0)
    vector: copy = v + tiny seeded noise, so cos(v, copy) > 0.999 while the
    fixture's natural pair cosines top out at ~0.51. Copy ids = vec_id+10000."""
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = base.filter(F.col("vec_id") % 12 == 0).collect()[:n_dups]
    rng = np.random.default_rng(seed)
    dup_rows = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        noisy = v + rng.standard_normal(DIM) * (np.linalg.norm(v) * 1e-3)
        dup_rows.append((r["vec_id"] + 10000, [float(x) for x in noisy], r["label"]))
    dups = spark.createDataFrame(
        dup_rows, "vec_id long, embedding array<float>, label int"
    )
    planted = {(r["vec_id"], r["vec_id"] + 10000) for r in rows}
    return base.select("vec_id", "embedding", "label").unionByName(dups), planted


@pytest.fixture(scope="module")
def corpus(spark):
    df, planted = _planted(spark)
    return df.cache(), planted


def test_exact_pairs_find_exactly_the_planted_dups(spark, corpus):
    df, planted = corpus
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_dup_pairs(df, tau=0.95).collect()
    }
    assert got == planted


def test_exact_pairs_ordered_and_thresholded(spark, corpus):
    df, _ = corpus
    rows = cosine_dup_pairs(df, tau=0.95).collect()
    assert all(r["vec_id_a"] < r["vec_id_b"] for r in rows)
    assert all(r["cosine"] >= 0.95 for r in rows)


def test_lsh_recall_at_design_regime(spark, corpus):
    """Defaults (8 planes x 8 tables) predict recall ~0.99 at cos >= 0.999
    (p = 1 - acos(c)/pi ~ 0.986); every surviving pair must be a true
    above-threshold pair (exact cosine re-check inside the operator)."""
    df, planted = corpus
    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_dup_pairs(df, tau=0.95).collect()
    }
    approx = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_dup_pairs_lsh(df, tau=0.95, dim=DIM).collect()
    }
    assert approx <= exact  # no false positives: tau is re-applied exactly
    assert len(approx & planted) / len(planted) >= 0.9


def test_lsh_cosine_matches_exact_within_ulp(spark, corpus):
    """The Arrow kernel (einsum) and the SQL fold may differ only at float
    ulp level on shared pairs."""
    df, _ = corpus
    exact = {
        (r["vec_id_a"], r["vec_id_b"]): r["cosine"]
        for r in cosine_dup_pairs(df, tau=0.95).collect()
    }
    for r in cosine_dup_pairs_lsh(df, tau=0.95, dim=DIM).collect():
        assert abs(r["cosine"] - exact[(r["vec_id_a"], r["vec_id_b"])]) < 1e-9


def test_clusters_transitive_and_complete(spark, corpus):
    """Three near-identical copies of one vector must land in ONE cluster
    labeled by the minimum id; every corpus vector appears exactly once;
    non-duplicated vectors are singletons (cluster_id = vec_id)."""
    df, planted = corpus
    anchor = df.filter(F.col("vec_id") == 0).first()
    v = np.asarray(anchor["embedding"], dtype=np.float64)
    rng = np.random.default_rng(11)
    extra = spark.createDataFrame(
        [(20000 + i,
          [float(x) for x in v + rng.standard_normal(DIM) * (np.linalg.norm(v) * 1e-3)],
          0) for i in range(2)],
        "vec_id long, embedding array<float>, label int",
    )
    full = df.unionByName(extra)
    got = cosine_dup_clusters(full, tau=0.95, method="exact").collect()
    assert len(got) == full.count()  # total function: one row per vector
    label = {r["vec_id"]: r["cluster_id"] for r in got}
    # vec 0, its planted copy 10000, and the two chain copies: one component
    assert label[0] == label[10000] == label[20000] == label[20001] == 0
    # a vector with no planted copy is its own singleton cluster
    dup_ids = {a for a, _ in planted} | {b for _, b in planted}
    singleton = next(i for i in sorted(label) if i not in dup_ids and i != 0)
    assert label[singleton] == singleton


def test_lsh_parity_of_cluster_method(spark, corpus):
    """method='lsh' clustering agrees with method='exact' on the planted
    corpus (recall ~1 at this cosine level)."""
    df, _ = corpus
    exact = {(r["vec_id"], r["cluster_id"])
             for r in cosine_dup_clusters(df, tau=0.95, method="exact").collect()}
    lsh = {(r["vec_id"], r["cluster_id"])
           for r in cosine_dup_clusters(df, tau=0.95, method="lsh", dim=DIM).collect()}
    assert exact == lsh


def test_zero_vectors_exit_the_lsh_path(spark, corpus):
    """Zero-norm vectors have no direction: all of them would share one
    sign-pattern bucket per table (a planted n^2 hot key). The bucket
    kernel must route them off the path — no pairs among them, no stage
    failure, and real pairs unaffected."""
    df, planted = corpus
    zeros = spark.createDataFrame(
        [(30000 + i, [0.0] * DIM, 0) for i in range(50)],
        "vec_id long, embedding array<float>, label int",
    )
    poisoned = df.unionByName(zeros)
    got = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_dup_pairs_lsh(poisoned, tau=0.95, dim=DIM).collect()
    }
    assert not any(a >= 30000 or b >= 30000 for a, b in got)
    assert len(got & planted) / len(planted) >= 0.9


def test_first_collision_dedup_equals_distinct_candidates(spark, corpus):
    """cosine_dup_pairs_lsh dedups multi-table collisions by keeping a pair
    only at its FIRST colliding table (a filter on the carried bucket
    arrays) instead of a distinct over the collision-sized pair stream.
    The candidate ID set must equal the distinct formulation's exactly,
    and the operator's output must be duplicate-free."""
    from translink.ann import hyperplane_bucket_keys

    df, _ = corpus
    keys = hyperplane_bucket_keys(df, DIM, n_planes=4, n_tables=6)
    a = keys.select(F.col("vec_id").alias("a"), "table_id", "bucket")
    b = keys.select(F.col("vec_id").alias("b"), "table_id", "bucket")
    via_distinct = {
        (r["a"], r["b"])
        for r in a.join(b, ["table_id", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b").distinct().collect()
    }
    # tau=-1: keep EVERY candidate so the comparison covers the whole set
    got = [
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_dup_pairs_lsh(
            df, tau=-1.0, dim=DIM, n_planes=4, n_tables=6
        ).collect()
    ]
    assert len(got) == len(set(got))  # no multi-table duplicates survive
    assert set(got) == via_distinct
