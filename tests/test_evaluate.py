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
