"""Full-fidelity char-frequency histogram + H13 statistical blend.

Mirrors the reference's statistics tests (frequency-map fidelity
``src/pipeline/stats.rs:155-182``, similarity blend ``:236-265``): exact
counts, tie-breaks, and expr/arrow parity on every lane.
"""

import math

import pytest
from pyspark.sql import functions as F

from translink.histogram import doc_char_histogram, doc_stat_similarity_pairs

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank", "en"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank", "en"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat near the river bank", "en"),  # near dup of 0
        (3, "der schnelle braune fuchs springt nicht das ist und der hund", "de"),
        (4, "completely different words entirely unrelated content here talking", "en"),
        (5, "", "en"),                      # empty
        (6, "short", "en"),                 # all-distinct chars
        (7, "héllo \U0001f30d héllo", "fr"),  # multi-byte + astral
        (8, None, "en"),                    # null text
    ]
    return spark.createDataFrame(
        [(i, t, lang, "src", len(t or "")) for i, t, lang in rows], _SCHEMA
    ).cache()


def _hist_map(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_histogram_exact_values(spark, docs):
    h = _hist_map(doc_char_histogram(docs, method="arrow"))
    # "short": 5 distinct chars, each count 1; min-codepoint tie-break -> 'h'
    assert h[6]["n_chars"] == 5 and h[6]["distinct_chars"] == 5
    assert h[6]["top_char"] == "h" and h[6]["top_count"] == 1
    assert h[6]["hist_l2_sq"] == 5
    # empty + null text -> all zeros, '' top_char
    for i in (5, 8):
        assert h[i]["n_chars"] == 0 and h[i]["distinct_chars"] == 0
        assert h[i]["top_char"] == "" and h[i]["hist_l2_sq"] == 0
    # unicode counted per CODEPOINT: 'héllo 🌍 héllo' = 13 codepoints
    assert h[7]["n_chars"] == 13
    # counts: h2 é2 l4 o2 space2 🌍1 -> l2 = 4+4+16+4+4+1 = 33; top 'l' (4)
    assert h[7]["hist_l2_sq"] == 33
    assert h[7]["top_char"] == "l" and h[7]["top_count"] == 4
    assert h[7]["distinct_chars"] == 6
    # exact dups have identical histograms
    assert {k: v for k, v in h[0].items() if k != "doc_id"} == \
           {k: v for k, v in h[1].items() if k != "doc_id"}


def test_histogram_arrow_expr_parity(spark, docs):
    a = _hist_map(doc_char_histogram(docs, method="arrow"))
    e = _hist_map(doc_char_histogram(docs, method="expr"))
    assert a == e  # all-integer columns + top_char: bit-exact


def test_histogram_arrays(spark, docs):
    rows = {
        r["doc_id"]: r
        for r in doc_char_histogram(
            docs, method="arrow", include_arrays=True
        ).collect()
    }
    for i, r in rows.items():
        ks, cs = list(r["hist_keys"]), list(r["hist_counts"])
        assert ks == sorted(ks) and len(ks) == len(set(ks))  # cp-ascending
        assert sum(cs) == r["n_chars"] and len(ks) == r["distinct_chars"]
        assert sum(c * c for c in cs) == r["hist_l2_sq"]
    assert rows[5]["hist_keys"] == [] and rows[8]["hist_counts"] == []
    # spot-check doc 6 "short": codepoints sorted, counts all 1
    assert rows[6]["hist_keys"] == sorted(ord(c) for c in "short")
    with pytest.raises(ValueError):
        doc_char_histogram(docs, method="expr", include_arrays=True)


def _pairs_map(df):
    return {(r["doc_id_a"], r["doc_id_b"]): r.asDict() for r in df.collect()}


def test_stat_sim_identical_docs_score_100(spark, docs):
    got = _pairs_map(doc_stat_similarity_pairs(docs, method="arrow"))
    p = got[(0, 1)]  # exact dups: same block, identical histograms
    assert p["hist_cosine"] == 1.0
    assert p["entropy_sim"] == 100.0
    assert p["stat_sim"] == 100.0
    # every score is bounded and ordered sanely: near-dup >= unrelated
    for v in got.values():
        assert 0.0 <= v["hist_cosine"] <= 1.0
        assert v["entropy_sim"] <= 100.0
    if (0, 2) in got and (0, 4) in got:
        assert got[(0, 2)]["stat_sim"] >= got[(0, 4)]["stat_sim"]


def test_stat_sim_expr_arrow_parity(spark, docs):
    e = _pairs_map(doc_stat_similarity_pairs(docs, method="expr"))
    a = _pairs_map(doc_stat_similarity_pairs(docs, method="arrow"))
    assert set(e) == set(a) and e  # same blocked pair set
    for k in e:
        # integer dot + shared IEEE op order: cosine is bit-exact
        assert e[k]["hist_cosine"] == a[k]["hist_cosine"]
        # entropy lane: arrow kernel vs expr fold agree to ulp (round 9)
        assert math.isclose(
            e[k]["entropy_sim"], a[k]["entropy_sim"], abs_tol=1e-8
        )
        assert math.isclose(e[k]["stat_sim"], a[k]["stat_sim"], abs_tol=1e-8)


def test_stat_sim_threshold_filters(spark, docs):
    full = doc_stat_similarity_pairs(docs, threshold=0.0).count()
    cut = doc_stat_similarity_pairs(docs, threshold=99.0)
    got = _pairs_map(cut)
    assert len(got) <= full
    assert all(v["stat_sim"] >= 99.0 for v in got.values())
    assert (0, 1) in got


def test_stat_sim_full_reference_blend(spark, docs):
    """include_simhash=True: the reference's exact 0.4/0.4/0.2 weights
    (src/pipeline/stats.rs:262-264) with SimHash hamming similarity."""
    got = _pairs_map(
        doc_stat_similarity_pairs(docs, method="arrow", include_simhash=True)
    )
    p = got[(0, 1)]
    assert p["simhash_sim"] == 100.0 and p["stat_sim"] == 100.0
    for v in got.values():
        expect = round(
            0.4 * v["simhash_sim"] + 0.4 * v["hist_cosine"] * 100.0
            + 0.2 * v["entropy_sim"], 9,
        )
        assert math.isclose(v["stat_sim"], expect, abs_tol=1e-9)


def test_stat_sim_block_bound_under_planted_skew(spark):
    """500 same-length same-lang docs land in one block; the rank salt must
    bound every sub-block at max_block_size so no block goes quadratic."""
    n = 500
    df = spark.createDataFrame(
        [(i, f"padding text number {i:06d}", "en", "s", 23) for i in range(n)],
        _SCHEMA,
    )
    pairs = doc_stat_similarity_pairs(df, max_block_size=32, threshold=0.0)
    cnt = pairs.count()
    # ceil(500/32)=16 salts -> sub-blocks of ~31/32 rows: far below n^2/2
    assert 0 < cnt <= 16 * (32 * 31) // 2


def test_entropy_sim_clamped_at_zero(spark):
    """Per-codepoint entropy is unbounded (CJK text exceeds the 8-bit
    byte-distribution span the reference formula assumes): the closeness
    term must clamp at 0, not go negative and push stat_sim off its
    documented 0-100 scale."""
    rows = [
        # ~high-entropy doc: many distinct CJK codepoints, once each
        (1, "zh", "天地玄黄宇宙洪荒日月盈昃辰宿列张寒来暑往秋收冬藏闰余成岁律吕调阳"),
        # same lang + length bucket, near-zero entropy
        (2, "zh", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = doc_stat_similarity_pairs(docs, threshold=0.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["entropy_sim"] >= 0.0
    assert 0.0 <= r["stat_sim"] <= 100.0


def test_char_crossent_parity_and_semantics(spark):
    """Arrow and expr methods agree bit-for-bit (JVM log2 fold, same
    order, round 9); an atypical-alphabet doc scores HIGHER than a doc
    written in the corpus's dominant characters; empty docs score 0."""
    from translink.histogram import doc_char_crossent

    rows = [(i, f"plain english text number {i}") for i in range(20)]
    rows += [(100, "Ã©Ã¨Â¿ mojibake Ã±"),
             (101, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["cross_entropy_bits"]
         for r in doc_char_crossent(docs, method="arrow").collect()}
    e = {r["doc_id"]: r["cross_entropy_bits"]
         for r in doc_char_crossent(docs, method="expr").collect()}
    assert a == e
    assert a[101] == 0.0
    typical = max(a[i] for i in range(20))
    assert a[100] > typical  # rare codepoints -> higher surprise

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown method"):
        doc_char_crossent(docs, method="arow")
