"""Pivot matrix and rollup hierarchy: known values, dense-zero fill,
catch-all lane, and level encoding."""

from pyspark.sql import functions as F

from translink.rollup import doc_lang_source_matrix, doc_source_lang_rollup


def _docs(spark):
    rows = [
        (1, "a", "en", "web", 10),
        (2, "b", "en", "web", 20),
        (3, "c", "de", "web", 30),
        (4, "d", "tlh", "web", 40),   # not a pinned lane -> other
        (5, "e", None, "web", 50),    # null lang -> other
        (6, "f", "en", "book", 60),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_pivot_matrix_dense_and_catch_all(spark):
    got = {r["source"]: r.asDict() for r in doc_lang_source_matrix(_docs(spark)).collect()}
    web, book = got["web"], got["book"]
    assert (web["en"], web["de"], web["other"]) == (2, 1, 2)
    assert (web["es"], web["fr"], web["zh"]) == (0, 0, 0)  # dense zeros, not nulls
    assert (book["en"], book["other"]) == (1, 0)


def test_pivot_matrix_schema_is_pinned(spark):
    out = doc_lang_source_matrix(_docs(spark), langs=["en", "de"])
    assert out.columns == ["source", "en", "de", "other"]


def test_rollup_levels(spark):
    rows = {
        (r["source"], r["lang"], r["level"]): (r["n_docs"], r["total_chars"])
        for r in doc_source_lang_rollup(_docs(spark)).collect()
    }
    assert rows[("web", "en", 0)] == (2, 30)
    assert rows[("web", None, 1)] == (5, 150)      # per-source subtotal
    assert rows[(None, None, 3)] == (6, 210)       # grand total
    # null-lang leaf is distinguishable from the subtotal by level
    assert rows[("web", None, 0)] == (1, 50)
    # subtotals equal the sum of their leaves
    leaf_web = sum(v[0] for k, v in rows.items() if k[0] == "web" and k[2] == 0)
    assert leaf_web == rows[("web", None, 1)][0]
