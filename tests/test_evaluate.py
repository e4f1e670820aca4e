"""Blocking-quality metrics (pairs completeness / quality / reduction
ratio — Christen 2012 ch. 7) and their driver-query twin."""

from pyspark.sql import functions as F

from translink.evaluate import blocking_quality, blocking_quality_frame


def _frames(spark):
    cand = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "c"), ("c", "d"), ("e", "f")],
        "conv_id_a string, conv_id_b string",
    )  # (c,d) listed twice in both orders: must count once
    truth = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("x", "y")],
        "conv_id_a string, conv_id_b string",
    )
    return cand, truth


def test_blocking_quality_frame_counts_and_ratios(spark):
    cand, truth = _frames(spark)
    row = blocking_quality_frame(cand, truth).first()
    assert row["n_candidates"] == 4          # (a,b) (a,c) (c,d) (e,f)
    assert row["n_true"] == 3
    assert row["n_true_covered"] == 2        # (a,b), (c,d); (x,y) missed
    assert abs(row["pairs_completeness"] - 2 / 3) < 1e-12
    assert abs(row["pairs_quality"] - 2 / 4) < 1e-12


def test_blocking_quality_reduction_ratio(spark):
    cand, truth = _frames(spark)
    out = blocking_quality(cand, truth, n_records=8)
    assert abs(out["reduction_ratio"] - (1.0 - 4 / 28)) < 1e-12


def test_blocking_quality_empty_truth_is_null_not_error(spark):
    cand, truth = _frames(spark)
    row = blocking_quality_frame(
        cand, truth.filter(F.lit(False))
    ).first()
    assert row["n_true"] == 0 or row["n_true"] is None
    assert row["pairs_completeness"] is None  # 0/0: NULL in both engines


def test_blocking_eval_query_on_derived_corpus(spark):
    """The registered driver query: the engine's salted attribute blocking
    must retain nearly all planted twin pairs. The two loss modes the
    metric tolerates are structural, not salting bugs: a +3-char near-dup
    edit can cross a length-bucket boundary (different block_key — the
    LSH blocker's job, and the pipeline F1=1.0 gate proves the union
    recovers them), and an exact-dup pair can straddle a chunk boundary
    at ~1/max_block_size odds (recovered by the exact-digest path). At
    sf0.001 that is 5 of 49 truth pairs -> floor 0.85. The old modulo
    salt scored 0.245 here — this test is the regression gate for
    sorted-neighborhood chunk salting (translink/blocking.py)."""
    import __spark_entry__ as entry

    row = entry.queries()["blocking_eval"](
        spark, "/root/testdata/sf0.001"
    ).first()
    assert row["n_true"] > 0
    assert row["n_candidates"] > 0
    assert row["pairs_completeness"] >= 0.85
    assert 0.0 < row["pairs_quality"] <= 1.0


def test_bcubed_known_example(spark):
    """Hand-computed B-cubed: pred {1,2,3},{4,5} vs truth {1,2},{3,4,5}.
    P = R = 11/15 (cells (2/3,2/3,2), (1/3,1/3,1), (2/2,2/3,2))."""
    from translink.evaluate import bcubed_prf

    pred = spark.createDataFrame(
        [("r1", "A"), ("r2", "A"), ("r3", "A"), ("r4", "B"), ("r5", "B")],
        "conv_id string, cluster_id string",
    )
    truth = spark.createDataFrame(
        [("r1", "T1"), ("r2", "T1"), ("r3", "T2"), ("r4", "T2"), ("r5", "T2")],
        "conv_id string, true_id string",
    )
    out = bcubed_prf(pred, truth)
    assert out["n_records"] == 5
    assert abs(out["precision"] - 11 / 15) < 1e-12
    assert abs(out["recall"] - 11 / 15) < 1e-12
    assert abs(out["f1"] - 11 / 15) < 1e-12


def test_bcubed_perfect_clustering_is_one(spark):
    from translink.evaluate import bcubed_prf

    pred = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2)], "conv_id string, cluster_id int"
    )
    truth = pred.selectExpr("conv_id", "cluster_id AS true_id")
    out = bcubed_prf(pred, truth)
    assert out["precision"] == out["recall"] == out["f1"] == 1.0


def test_bcubed_inner_join_drops_unlabeled(spark):
    """Records present on only one side are outside the evaluated
    population (B³ is defined over commonly-labeled records)."""
    from translink.evaluate import bcubed_prf

    pred = spark.createDataFrame(
        [("a", 1), ("b", 1), ("zz", 9)], "conv_id string, cluster_id int"
    )
    truth = spark.createDataFrame(
        [("a", "t"), ("b", "t")], "conv_id string, true_id string"
    )
    out = bcubed_prf(pred, truth)
    assert out["n_records"] == 2
    assert out["f1"] == 1.0


def test_bcubed_query_matches_helper_on_derived_corpus(spark):
    """The driver query's integer histogram reproduces the helper's
    scalars, and the exact clustering scores high-but-imperfect B³ on the
    planted corpus (near-dups split from their base: recall < 1)."""
    import __spark_entry__ as entry

    rows = entry.queries()["dedup_eval_bcubed"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    hist = sorted(
        (r["cluster_size"], r["truth_size"], r["cell_size"], r["n_cells"])
        for r in rows
    )
    n = sum(s * k for _, _, s, k in hist)
    p = sum(k * s * s / cs for cs, _, s, k in hist) / n
    r = sum(k * s * s / ts for _, ts, s, k in hist) / n
    assert n > 0
    assert p == 1.0   # exact clustering never merges distinct texts
    assert 0.5 < r < 1.0  # _nd twins stay split -> recall below 1


# -- cluster evidence-graph diagnostics ------------------------------------

def _graph_frames(spark):
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"),
         ("f", "f")],
        "conv_id string, cluster_id string",
    )
    sim = spark.createDataFrame(
        [("a", "b", 0.8), ("b", "c", 0.75)],
        "src string, dst string, score double",
    )
    star = spark.createDataFrame(
        [("d", "e")], "src string, dst string"
    )
    return clusters, sim, star


def test_cluster_graph_stats_per_lane_counts(spark):
    from translink.evaluate import cluster_graph_stats

    clusters, sim, star = _graph_frames(spark)
    rows = {
        r["cluster_id"]: r
        for r in cluster_graph_stats(clusters, sim, star).collect()
    }
    # singleton f never appears
    assert set(rows) == {"a", "d"}
    a = rows["a"]
    assert (a["n_members"], a["n_sim_edges"], a["n_exact_edges"]) == (3, 2, 0)
    assert a["min_edge_score"] == 0.75          # thin chain: min hugs 0.75
    assert abs(a["sim_density"] - 4 / 6) < 1e-12  # 2 of 3 possible pairs
    d = rows["d"]
    assert (d["n_members"], d["n_sim_edges"], d["n_exact_edges"]) == (2, 0, 1)
    assert d["min_edge_score"] is None          # exact evidence only
    assert d["sim_density"] == 0.0


def test_cluster_stability_split_report(spark):
    from translink.evaluate import cluster_stability

    base = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"),
         ("f", "f")],
        "conv_id string, cluster_id string",
    )
    # at the strict threshold, base cluster 'a' scatters into {a,b} + {c};
    # 'd' survives intact; singleton 'f' is excluded (n_members < 2)
    strict = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d"), ("e", "d"),
         ("f", "f")],
        "conv_id string, cluster_id string",
    )
    rows = {
        r["cluster_id"]: r for r in cluster_stability(base, strict).collect()
    }
    assert set(rows) == {"a", "d"}
    assert (rows["a"]["n_sub"], rows["a"]["splits"]) == (2, True)
    assert (rows["d"]["n_sub"], rows["d"]["splits"]) == (1, False)


# -- threshold calibration sweep --------------------------------------------

def test_threshold_sweep_counts_and_metrics(spark):
    from translink.evaluate import threshold_sweep

    scored = spark.createDataFrame(
        [("a", "b", 0.9), ("c", "d", 0.6), ("e", "f", 0.8)],
        "conv_id_a string, conv_id_b string, score double",
    )
    truth = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("x", "y")],   # (x,y) never scored
        "conv_id_a string, conv_id_b string",
    )
    rows = {
        r["threshold"]: r
        for r in threshold_sweep(scored, truth, [0.5, 0.7, 0.95]).collect()
    }
    assert set(rows) == {0.5, 0.7, 0.95}
    # at 0.5 every scored pair is an edge: tp=2, fp=1, fn=1 (blocking miss)
    r = rows[0.5]
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 1)
    assert abs(r["precision"] - 2 / 3) < 1e-12
    assert abs(r["recall"] - 2 / 3) < 1e-12
    # at 0.7 only (a,b) survives among true pairs: tp=1, fp=1, fn=2
    r = rows[0.7]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 2)
    assert abs(r["f1"] - 2 / 5) < 1e-12
    # at 0.95 nothing survives: zero denominators -> NULL, not an error
    r = rows[0.95]
    assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 3)
    assert r["precision"] is None
    assert abs(r["recall"] - 0.0) < 1e-12


def test_threshold_sweep_blocking_miss_is_fn_at_every_threshold(spark):
    from translink.evaluate import threshold_sweep

    scored = spark.createDataFrame(
        [], "conv_id_a string, conv_id_b string, score double"
    )
    truth = spark.createDataFrame(
        [("p", "q")], "conv_id_a string, conv_id_b string"
    )
    for r in threshold_sweep(scored, truth, [0.5, 0.9]).collect():
        assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 1)
        assert r["precision"] is None and r["f1"] == 0.0


def test_cluster_glue_edges_names_the_splitting_evidence(spark):
    from translink.evaluate import cluster_glue_edges

    base = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")],
        "conv_id string, cluster_id string",
    )
    strict = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d"), ("e", "d")],
        "conv_id string, cluster_id string",
    )
    edges = spark.createDataFrame(
        [("a", "b", 0.95), ("b", "c", 0.72), ("d", "e", 0.93)],
        "src string, dst string, score double",
    )
    rows = cluster_glue_edges(base, strict, edges).collect()
    # exactly the weak (b, c) edge is the glue: its endpoints split at
    # the strict threshold, the strong edges stay intra-sub-cluster
    assert len(rows) == 1
    r = rows[0]
    assert (r["cluster_id"], r["src"], r["dst"], r["score"]) == (
        "a", "b", "c", 0.72,
    )
