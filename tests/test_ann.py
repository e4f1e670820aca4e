"""ANN operators: exact top-k sanity, LSH recall vs exact baseline."""

import pytest
from pyspark.sql import functions as F

from translink.ann import (
    cosine_topk,
    cosine_topk_lsh,
    knn_label_vote,
    with_hyperplane_bucket,
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df.cache()


def test_topk_shape_and_self_exclusion(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    got = cosine_topk(emb, q, k=3)
    rows = got.collect()
    assert len(rows) == 5 * 3
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)
    assert all(1 <= r["rank"] <= 3 for r in rows)
    assert all(-1.0 <= r["cosine"] <= 1.0 + 1e-12 for r in rows)


def test_topk_ordering(spark, emb):
    q = emb.filter(F.col("vec_id") == 0)
    rows = cosine_topk(emb, q, k=10).orderBy("rank").collect()
    scores = [r["cosine"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_identical_vector_is_top1(spark, emb):
    # plant an exact copy of vec 0 under a new id
    copy = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(99999).cast("long"))
    corpus = emb.unionByName(copy)
    top1 = (
        cosine_topk(corpus, emb.filter(F.col("vec_id") == 0), k=1)
        .first()
    )
    assert top1["neighbor_id"] == 99999
    assert abs(top1["cosine"] - 1.0) < 1e-12


def test_bucket_determinism(spark, emb):
    b1 = {r["vec_id"]: r["bucket"] for r in
          with_hyperplane_bucket(emb, dim=64, n_planes=8).select("vec_id", "bucket").collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in
          with_hyperplane_bucket(emb, dim=64, n_planes=8).select("vec_id", "bucket").collect()}
    assert b1 == b2
    assert all(0 <= v < 256 for v in b1.values())


def test_lsh_recall_vs_exact(spark, emb):
    """Multi-table bucketed ANN: recall@5 against the exact baseline.
    Random gaussian vectors are LSH's worst case (top neighbors sit near
    cos ~0.45, p ~0.65/plane); 6 planes x 16 tables predicts recall ~0.6."""
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in cosine_topk_lsh(emb, q, k=5, dim=64,
                                       n_planes=6, n_tables=16).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.4, recall


def test_knn_label_vote(spark, emb):
    got = knn_label_vote(emb, emb.filter(F.col("vec_id") < 5), k=5)
    rows = got.collect()
    assert len(rows) == 5
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert all(r["predicted_label"] in labels for r in rows)
    assert all(1 <= r["votes"] <= 5 for r in rows)


def test_lsh_survives_null_and_ragged_vectors(spark, emb):
    """One bad embedding row (null vector, or wrong dimension) must not kill
    the job: bad rows exit the LSH path (null bucket -> no candidate keys,
    NaN cosine -> filtered before ranking) and every clean query still gets
    its neighbors."""
    dim = len(emb.first()["embedding"])
    bad = spark.createDataFrame(
        [(900001, None, "x"), (900002, [1.0, 2.0], "x")],
        "vec_id long, embedding array<float>, label string",
    )
    poisoned = emb.select("vec_id", "embedding", "label").unionByName(bad)
    queries = poisoned.filter(
        (F.col("vec_id") % 50 == 0) | (F.col("vec_id") >= 900001)
    )
    got = cosine_topk_lsh(poisoned, queries, k=3, dim=dim,
                          n_planes=6, n_tables=16)
    rows = got.collect()
    ids = {r["query_id"] for r in rows}
    # bad rows produce no results; clean queries are unaffected
    assert 900001 not in ids and 900002 not in ids
    clean = cosine_topk_lsh(emb, emb.filter(F.col("vec_id") % 50 == 0), k=3,
                            dim=dim, n_planes=6, n_tables=16)
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rows} == \
           {(r["query_id"], r["neighbor_id"], r["rank"]) for r in clean.collect()}


def test_ivf_recall_vs_exact(spark, emb):
    """IVF-probed ANN: recall@5 against the exact baseline. Random gaussian
    vectors are IVF's worst case too (no cluster structure for the
    centroids to exploit) — probing 8/16 cells should still clear half."""
    from translink.ann import cosine_topk_ivf

    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in cosine_topk_ivf(emb, q, k=5, dim=64,
                                       n_centroids=16, n_probe=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.5, recall


def test_ivf_deterministic_and_finds_planted_duplicate(spark, emb):
    """The coarse quantizer assigns an exact copy to the same cell as the
    query's own top-1 probe, so a planted duplicate is always found; two
    runs over the same input produce identical results (seeded sample +
    seeded k-means, no unseeded randomness anywhere)."""
    from translink.ann import cosine_topk_ivf

    copy = emb.filter(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(99999).cast("long"))
    corpus = emb.unionByName(copy)
    q = emb.filter(F.col("vec_id") == 0)
    r1 = cosine_topk_ivf(corpus, q, k=3, dim=64,
                         n_centroids=16, n_probe=4).collect()
    r2 = cosine_topk_ivf(corpus, q, k=3, dim=64,
                         n_centroids=16, n_probe=4).collect()
    key = lambda rows: [(r["query_id"], r["neighbor_id"], r["rank"]) for r in
                        sorted(rows, key=lambda x: (x["query_id"], x["rank"]))]
    assert key(r1) == key(r2)
    top1 = min(r1, key=lambda r: r["rank"])
    assert top1["neighbor_id"] == 99999
    assert abs(top1["cosine"] - 1.0) < 1e-12


def test_ivf_survives_null_and_ragged_vectors(spark, emb):
    """Malformed embeddings exit the IVF path (null cell / NaN cosine)
    without failing the stage or changing clean queries' results."""
    from translink.ann import cosine_topk_ivf

    dim = len(emb.first()["embedding"])
    bad = spark.createDataFrame(
        [(900001, None, "x"), (900002, [1.0, 2.0], "x")],
        "vec_id long, embedding array<float>, label string",
    )
    poisoned = emb.select("vec_id", "embedding", "label").unionByName(bad)
    queries = poisoned.filter(
        (F.col("vec_id") % 50 == 0) | (F.col("vec_id") >= 900001)
    )
    rows = cosine_topk_ivf(poisoned, queries, k=3, dim=dim,
                           n_centroids=16, n_probe=8).collect()
    ids = {r["query_id"] for r in rows}
    assert 900001 not in ids and 900002 not in ids
    clean = cosine_topk_ivf(emb, emb.filter(F.col("vec_id") % 50 == 0), k=3,
                            dim=dim, n_centroids=16, n_probe=8)
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in rows} == \
           {(r["query_id"], r["neighbor_id"], r["rank"]) for r in clean.collect()}


def test_ivf_training_rejects_unusable_sample():
    """An all-zero / empty training sample must fail with a diagnosis, not
    numpy's rng.integers(0) ValueError from inside kmeans++."""
    import numpy as np
    import pytest as _pytest

    from translink.ann import _train_centroids

    rng = np.random.default_rng(7)
    with _pytest.raises(ValueError, match="no usable vectors"):
        _train_centroids(np.zeros((4, 8)), n_centroids=2, iters=2, rng=rng)
    with _pytest.raises(ValueError, match="no usable vectors"):
        _train_centroids(np.zeros((0, 8)), n_centroids=2, iters=2, rng=rng)
    # the truly-empty sample (shape (0,), what np.array([]) gives when the
    # sampled table has no rows) must hit the SAME diagnosis, not numpy's
    # AxisError from norm(axis=1)
    with _pytest.raises(ValueError, match="no usable vectors"):
        _train_centroids(np.array([]), n_centroids=2, iters=2, rng=rng)


def test_exact_paths_survive_degenerate_vectors(spark):
    """Degenerate operands (NULL / empty / ragged / paired-with-zero-norm)
    score NULL cosine — not a DIVIDE_BY_ZERO (ANSI Divide throws on a zero
    divisor even with a NULL numerator) and not a PARTIAL dot product (the
    unguarded DuckDB twin summed the overlapping dims of ragged pairs).
    Degenerate neighbors must rank BELOW every scored neighbor."""
    from translink.ann import cosine_dup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, None),                          # NULL vector
        (4, []),                            # zero-norm (empty) vector
        (5, [1.0, 2.0]),                    # ragged (wrong dim)
        (6, [float("nan"), 0.1, 0.1]),      # NaN element -> NaN fold
        (7, [float("inf"), 0.1, 0.1]),      # Inf element -> inf/inf = NaN
        (8, [0.0, 0.0, 0.0]),               # right-dim zero norm
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    bad = (3, 4, 5, 6, 7, 8)

    topk = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=8).collect()
    got = {r["neighbor_id"]: (r["rank"], r["cosine"]) for r in topk}
    # Spark orders NaN ABOVE every real double: without the nanvl guard the
    # NaN/Inf neighbors (6, 7) would take ranks 1-2 ahead of real scores
    assert got[1][0] == 1 and got[2][0] == 2          # real neighbors first
    assert all(got[i][1] is None for i in bad)        # degenerate -> NULL
    assert all(got[i][0] > 2 for i in bad)            # ...and ranked last

    pairs = cosine_dup_pairs(emb, tau=0.4).collect()  # must not throw
    ids = {(r["vec_id_a"], r["vec_id_b"]) for r in pairs}
    assert (0, 1) in ids
    # Spark evaluates NaN >= tau as TRUE: unguarded, 6 and 7 would pair
    # with every vector in the corpus
    assert not any(a in bad or b in bad for a, b in ids)


def test_ivf_recall_at_design_regime(spark, emb):
    """IVF's design regime is near-duplicate retrieval: queries that are
    tiny perturbations of corpus vectors (cos ~0.9998). The perturbed
    query quantizes into its base vector's cell (or a probed neighbor
    cell), so top-1 must recover the base — a pinned >= 0.9 floor so
    approximate-lane drift fails loudly (the random-gaussian test above
    covers the worst case; this one covers the case users run)."""
    import numpy as np

    from translink.ann import cosine_topk_ivf

    rng = np.random.default_rng(11)
    base = emb.filter(F.col("vec_id") < 40).collect()
    dim = len(base[0]["embedding"])
    rows = []
    for r in base:
        v = np.asarray(r["embedding"], dtype=np.float64)
        noise = rng.standard_normal(dim)
        v = v + 0.02 * float(np.linalg.norm(v)) / np.sqrt(dim) * noise
        rows.append((int(r["vec_id"]) + 500000, [float(x) for x in v], "q"))
    q = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")
    got = cosine_topk_ivf(emb, q, k=1, dim=dim, n_centroids=16, n_probe=4)
    hits = sum(1 for r in got.collect()
               if r["neighbor_id"] == r["query_id"] - 500000)
    assert hits / len(base) >= 0.9, hits
