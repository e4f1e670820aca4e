"""Shingle containment: sub-document duplication that Jaccard misses."""

import pytest
from pyspark.sql import functions as F

from translink.textops import doc_containment_pairs, doc_jaccard_pairs

SHORT = "alpha beta gamma delta epsilon zeta"
LONG = (
    "a very long host document with many unrelated filler tokens one two "
    "three four five six seven eight nine ten containing the quote "
    + SHORT +
    " inside it followed by even more unrelated filler words red green "
    "blue cyan magenta yellow umber ochre teal navy maroon"
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, SHORT),
            (2, LONG),
            (3, "a completely different document about tidal patterns and "
                "lunar cycles affecting coastal navigation schedules"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_short_in_long_found_with_direction(spark, corpus):
    rows = doc_containment_pairs(corpus, threshold=0.8).collect()
    got = {(r["doc_id_a"], r["doc_id_b"]): r for r in rows}
    assert (1, 2) in got
    r = got[(1, 2)]
    # every shingle of the short doc appears in the long doc
    assert r["containment_a_in_b"] == 1.0
    # the long doc is NOT contained in the short one
    assert r["containment_b_in_a"] < 0.5
    # no pair involves the unrelated or empty doc
    assert all(a in (1, 2) and b in (1, 2) for a, b in got)


def test_jaccard_misses_what_containment_catches(spark, corpus):
    """The motivating case: the same pair scores low symmetric Jaccard
    (union diluted by the host's extra shingles)."""
    j = doc_jaccard_pairs(
        corpus.withColumn("lang", F.lit("en")), threshold=0.8
    ).collect()
    assert not any(
        {r["doc_id_a"], r["doc_id_b"]} == {1, 2} for r in j
    )


def test_arrow_expr_parity(spark, corpus):
    fast = sorted(map(tuple, doc_containment_pairs(
        corpus, threshold=0.8, method="arrow").collect()))
    expr = sorted(map(tuple, doc_containment_pairs(
        corpus, threshold=0.8, method="expr").collect()))
    assert fast == expr and fast


def test_parity_on_fixture_docs(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fast = sorted(map(tuple, doc_containment_pairs(
        d, threshold=0.8, method="arrow").collect()))
    expr = sorted(map(tuple, doc_containment_pairs(
        d, threshold=0.8, method="expr").collect()))
    assert fast == expr


def test_df_cap_bounds_ubiquitous_grams(spark):
    """200 documents sharing ONLY one ubiquitous sentence must produce no
    candidates under the document-frequency cap — the inverted index drops
    grams above df_cap, so the hot gram cannot go quadratic."""
    common = "this exact boilerplate footer appears everywhere verbatim"
    docs = spark.createDataFrame(
        [(i, f"unique lead token{i} alpha{i} beta{i} " + common)
         for i in range(200)],
        "doc_id long, text string",
    )
    rows = doc_containment_pairs(docs, threshold=0.3, df_cap=64).collect()
    assert rows == []
