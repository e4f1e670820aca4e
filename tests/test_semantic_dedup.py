"""SemDeDup-style semantic dedup: within-cell pairs, keep policies,
degenerate-vector handling, determinism.

The operator family (translink/ann.py: assign_ivf_cells /
semantic_dup_pairs / semantic_dedup_keep) has no ANSI-SQL twin (k-means
training is iterative), so this file IS its correctness pin: precision
against the exact pair set, planted-duplicate recall, one-keeper-per-
cluster invariants, and the farthest-from-centroid election rule.
"""

import pytest
from pyspark.sql import Window, functions as F

from translink.ann import (
    assign_ivf_cells,
    cosine_dup_pairs,
    semantic_dedup_keep,
    semantic_dup_pairs,
)

TAU = 0.4  # fixture embeddings are random gaussians (max pair cosine ~0.51)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()


def _pairset(df):
    return {(r["vec_id_a"], r["vec_id_b"]) for r in df.collect()}


def test_semantic_pairs_are_exact_pairs(spark, emb):
    """Precision 1.0 up to float-op order: every within-cell pair passed an
    exact cosine threshold, so it must appear in the exact cross-join pair
    set at a slightly looser tau (the Arrow einsum and the SQL fold may
    disagree in the last ulp at the boundary)."""
    sem = _pairset(semantic_dup_pairs(emb, tau=TAU, n_centroids=8))
    exact = _pairset(cosine_dup_pairs(emb, tau=TAU - 1e-6))
    assert sem, "no semantic pairs found at the fixture threshold"
    assert sem <= exact


def test_planted_duplicates_pair_and_dedup(spark, emb):
    """An exact vector copy lands in the same cell deterministically (same
    argmax), so SemDeDup must pair it with its source at ANY tau and keep
    exactly one of the two."""
    copies = (
        emb.filter(F.col("vec_id") < 5)
        .withColumn("vec_id", F.col("vec_id") + 100000)
    )
    corpus = emb.unionByName(copies)
    pairs = semantic_dup_pairs(corpus, tau=0.999, n_centroids=16)
    got = _pairset(pairs)
    assert {(i, i + 100000) for i in range(5)} <= got

    verdict = semantic_dedup_keep(corpus, tau=0.999, n_centroids=16)
    rows = verdict.filter(
        (F.col("vec_id") < 5) | (F.col("vec_id") >= 100000)
    ).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    planted = [m for m in by_cluster.values() if len(m) == 2]
    assert len(planted) == 5
    for members in planted:
        assert sum(m["keep"] for m in members) == 1


def test_keep_invariants_and_coverage(spark, emb):
    """Every corpus id appears exactly once; every cluster elects exactly
    one keeper; singletons keep themselves."""
    verdict = semantic_dedup_keep(emb, tau=TAU, n_centroids=8).cache()
    assert verdict.count() == emb.count()
    assert verdict.select("vec_id").distinct().count() == emb.count()
    per_cluster = verdict.groupBy("cluster_id").agg(
        F.sum(F.col("keep").cast("int")).alias("keeps"),
        F.count("*").alias("n"),
    )
    assert per_cluster.filter(F.col("keeps") != 1).count() == 0
    singles = per_cluster.filter(F.col("n") == 1).count()
    assert singles > 0  # fixture is mostly singletons at this tau
    verdict.unpersist()


def test_farthest_policy_elects_min_centroid_sim(spark, emb):
    """The SemDeDup election rule: within a multi-member cluster the keeper
    has the minimum cosine-to-centroid (most atypical member)."""
    verdict = semantic_dedup_keep(
        emb, tau=TAU, n_centroids=8, keep_policy="farthest"
    )
    multi = (
        verdict.withColumn(
            "n", F.count("*").over(Window.partitionBy("cluster_id"))
        )
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert multi, "expected at least one multi-member cluster at tau=0.4"
    by_cluster = {}
    for r in multi:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        kept = [m for m in members if m["keep"]]
        assert len(kept) == 1
        min_sim = min(m["cent_sim"] for m in members)
        assert kept[0]["cent_sim"] == pytest.approx(min_sim)


def test_min_id_policy(spark, emb):
    verdict = semantic_dedup_keep(
        emb, tau=TAU, n_centroids=8, keep_policy="min_id"
    )
    bad = verdict.filter(
        F.col("keep") & (F.col("vec_id") != F.col("cluster_id"))
    ).count()
    # min_id keeper == cluster label (cluster_id is the component min id)
    assert bad == 0
    with pytest.raises(ValueError):
        semantic_dedup_keep(emb, keep_policy="typo")


def test_degenerate_vectors_are_singleton_keeps(spark, emb):
    """NULL / ragged / zero / NaN vectors have no direction: they must exit
    the cell path (NULL cell, NULL cent_sim), never pair, and survive as
    their own kept singletons — not kill the job."""
    hostile = spark.createDataFrame(
        [
            (90001, None, 0),
            (90002, [float("nan")] * 64, 0),
            (90003, [0.0] * 64, 0),
            (90004, [1.0, 2.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    corpus = emb.unionByName(hostile)
    cells = assign_ivf_cells(corpus, n_centroids=8)
    got = {
        r["vec_id"]: (r["cell"], r["cent_sim"])
        for r in cells.filter(F.col("vec_id") >= 90000).collect()
    }
    assert set(got) == {90001, 90002, 90003, 90004}
    assert all(c is None and s is None for c, s in got.values())

    verdict = semantic_dedup_keep(corpus, tau=TAU, n_centroids=8)
    rows = {
        r["vec_id"]: r
        for r in verdict.filter(F.col("vec_id") >= 90000).collect()
    }
    assert set(rows) == {90001, 90002, 90003, 90004}
    for vid, r in rows.items():
        assert r["cluster_id"] == vid and r["keep"] and r["cent_sim"] is None


def test_recall_at_design_regime_with_planted_near_dups(spark):
    """The operator's actual regime: tau >= 0.9 over a corpus with real
    near-duplicate families (noisy copies, cosine ~0.97+ to their base).
    Families are tight clusters, so k-means puts them in one cell and
    recall vs the exact cross-join pair set stays high; background
    vectors are random gaussians and must not merge."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for fam in range(20):
        base = rng.standard_normal(64)
        base /= np.linalg.norm(base)
        for _ in range(4):
            noisy = base + 0.15 * rng.standard_normal(64) / np.sqrt(64)
            rows.append((vid, [float(x) for x in noisy], fam))
            vid += 1
    for _ in range(100):
        rows.append((vid, [float(x) for x in rng.standard_normal(64)], -1))
        vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    exact = _pairset(cosine_dup_pairs(emb, tau=0.9))
    sem = _pairset(semantic_dup_pairs(emb, tau=0.9, n_centroids=16))
    assert exact, "planted families must produce exact near-dup pairs"
    assert sem <= exact
    recall = len(sem & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} below design floor"
    # background vectors never pair at tau=0.9
    bg_ids = {r[0] for r in rows if r[2] == -1}
    assert not any(a in bg_ids or b in bg_ids for a, b in sem)

    # the verdict keeps exactly one member of every fully-connected family
    verdict = semantic_dedup_keep(emb, tau=0.9, n_centroids=16)
    fam_of = {r[0]: r[2] for r in rows if r[2] >= 0}
    kept = [r for r in verdict.collect() if r["vec_id"] in fam_of and r["keep"]]
    kept_per_fam = {}
    for r in kept:
        kept_per_fam.setdefault(fam_of[r["vec_id"]], 0)
        kept_per_fam[fam_of[r["vec_id"]]] += 1
    # every family keeps at least 1; a family collapses to exactly 1
    # whenever its members form one component (the common case here)
    assert all(v >= 1 for v in kept_per_fam.values())
    assert sum(kept_per_fam.values()) <= 20 + 5  # near-total collapse


def test_determinism(spark, emb):
    a = sorted(map(tuple, semantic_dedup_keep(emb, tau=TAU, n_centroids=8)
                   .collect()))
    b = sorted(map(tuple, semantic_dedup_keep(emb, tau=TAU, n_centroids=8)
                   .collect()))
    assert a == b
