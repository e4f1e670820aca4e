"""Benchmark decontamination: n-gram overlap + exact-match flags, Arrow/expr
parity, and the clean-corpus anti-join."""

import pytest
from pyspark.sql import functions as F

from translink.textops import doc_decontaminate, doc_decontaminated_corpus

BENCH_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill nearby"
)


@pytest.fixture(scope="module")
def corpora(spark):
    bench = spark.createDataFrame(
        [(9000, BENCH_TEXT), (9001, "completely different benchmark prompt "
                                    "about particle physics experiments at "
                                    "high energy colliders today")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # exact copy of a benchmark doc
            (1, BENCH_TEXT),
            # carries a >=8-token contiguous span of benchmark text
            (2, "intro words then the quick brown fox jumps over the lazy "
                "dog while the cat rests and some trailing words"),
            # clean
            (3, "an entirely unrelated training document discussing bread "
                "baking temperatures and hydration ratios for sourdough"),
            # short doc, no overlap
            (4, "tiny doc"),
            # empty
            (5, ""),
        ],
        "doc_id long, text string",
    )
    return docs, bench


def test_flags(spark, corpora):
    docs, bench = corpora
    got = {r["doc_id"]: r for r in doc_decontaminate(docs, bench).collect()}
    assert len(got) == 5  # one row per input doc
    assert got[1]["exact_match"] and got[1]["contaminated"]
    assert got[1]["matched_ngrams"] >= 1  # full-text copy shares grams too
    assert not got[2]["exact_match"]
    assert got[2]["matched_ngrams"] >= 1 and got[2]["contaminated"]
    for clean_id in (3, 4, 5):
        assert got[clean_id]["matched_ngrams"] == 0
        assert not got[clean_id]["exact_match"]
        assert not got[clean_id]["contaminated"]


def test_empty_benchmark_text_only_matches_empty_doc(spark, corpora):
    docs, _ = corpora
    bench_empty = spark.createDataFrame([(9100, "")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in doc_decontaminate(docs, bench_empty).collect()}
    assert got[5]["exact_match"] and got[5]["contaminated"]
    assert all(not got[i]["contaminated"] for i in (1, 2, 3, 4))


def test_arrow_expr_parity(spark, corpora):
    """The hashed-gram fast path must agree with the string-gram oracle
    path on every output column (hash collisions are negligible at any
    realistic gram count)."""
    docs, bench = corpora
    fast = sorted(map(tuple, doc_decontaminate(docs, bench, method="arrow").collect()))
    expr = sorted(map(tuple, doc_decontaminate(docs, bench, method="expr").collect()))
    assert fast == expr


def test_parity_on_fixture_corpus(spark):
    """Parity at fixture scale: documents table with a benchmark slice."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    is_bench = F.col("doc_id") % 17 == 0
    fast = sorted(map(tuple, doc_decontaminate(
        d.filter(~is_bench), d.filter(is_bench), method="arrow").collect()))
    expr = sorted(map(tuple, doc_decontaminate(
        d.filter(~is_bench), d.filter(is_bench), method="expr").collect()))
    assert fast == expr
    assert len(fast) == d.filter(~is_bench).count()


def test_clean_corpus_removes_exactly_the_flagged_docs(spark, corpora):
    docs, bench = corpora
    clean = doc_decontaminated_corpus(docs, bench)
    assert {r["doc_id"] for r in clean.collect()} == {3, 4, 5}
    # schema passes through untouched
    assert clean.columns == docs.columns


def test_min_matches_threshold(spark, corpora):
    """Raising min_matches demotes low-overlap docs (doc 2 shares a handful
    of 8-grams; an absurd threshold clears it) while exact matches stay
    contaminated regardless."""
    docs, bench = corpora
    got = {r["doc_id"]: r for r in
           doc_decontaminate(docs, bench, min_matches=10**6).collect()}
    assert not got[2]["contaminated"]
    assert got[1]["contaminated"]  # exact flag is threshold-independent
