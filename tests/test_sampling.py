"""Deterministic sampling: partitioning-invariance (the property
``df.sample`` lacks), zero-shuffle plan shape for the frac sampler, and
exact per-source quotas for the stratified sampler."""

from pyspark.sql import functions as F

from translink.sampling import doc_sample_frac, doc_sample_stratified


def _docs(spark, n=400, sources=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % sources).cast("string")).alias("source"),
        (F.col("id") % 97 + 10).cast("long").alias("n_chars"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )


def test_frac_sample_is_partitioning_invariant(spark):
    docs = _docs(spark)
    a = sorted(r["doc_id"] for r in doc_sample_frac(docs).collect())
    b = sorted(
        r["doc_id"] for r in doc_sample_frac(docs.repartition(13)).collect()
    )
    assert a == b and len(a) > 0


def test_frac_sample_rate_and_threshold(spark):
    docs = _docs(spark, n=2000)
    got = doc_sample_frac(docs, threshold_hex="8000").count()
    # 0x8000/0x10000 = 50% expected; binomial 3-sigma at n=2000 is ~67
    assert abs(got - 1000) < 100
    assert doc_sample_frac(docs, threshold_hex="0000").count() == 0


def test_frac_sample_plan_has_no_exchange(spark):
    plan = (
        doc_sample_frac(_docs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # Filter over the scan, zero shuffle


def test_stratified_quota_exact_per_source(spark):
    docs = _docs(spark, n=400, sources=4)  # 100 docs per source
    out = doc_sample_stratified(docs, per_source=15).groupBy("source").count()
    assert {r["source"]: r["count"] for r in out.collect()} == {
        f"src{i}": 15 for i in range(4)
    }


def test_stratified_quota_caps_at_source_size(spark):
    docs = _docs(spark, n=12, sources=4)  # only 3 docs per source
    out = doc_sample_stratified(docs, per_source=15)
    assert out.count() == 12
    assert out.filter(F.col("sample_rank") > 3).count() == 0


def test_stratified_is_deterministic(spark):
    docs = _docs(spark)
    a = sorted(r["doc_id"] for r in doc_sample_stratified(docs).collect())
    b = sorted(
        r["doc_id"]
        for r in doc_sample_stratified(docs.repartition(7)).collect()
    )
    assert a == b


def test_sample_frac_rejects_malformed_threshold(spark):
    """Uppercase / mis-sized thresholds silently selected the wrong
    fraction (lexicographic compare against lowercase hex keys)."""
    import pytest as _pytest

    from translink.sampling import doc_sample_frac

    docs = spark.createDataFrame(
        [(1, "en", "s", 10)], "doc_id long, lang string, source string, n_chars long"
    )
    for bad in ("20", "z000", "0x20"):
        with _pytest.raises(ValueError, match="hex"):
            doc_sample_frac(docs, threshold_hex=bad)
    # uppercase input is NORMALIZED, not rejected: same rows as lowercase
    lo = doc_sample_frac(docs, threshold_hex="a800").collect()
    hi = doc_sample_frac(docs, threshold_hex="A800").collect()
    assert lo == hi
