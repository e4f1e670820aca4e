"""Document-corpus operators: LSH vs brute-force parity, kernels.

Mirrors the reference's statistical-stage tests (duplicate detection
``tests/phase4_test.rs:174-208``, similarity ordering ``:240-269``).
"""

import pytest
from pyspark.sql import functions as F

from translink.config import LinkConfig
from translink.textops import (
    doc_exact_dup_clusters,
    doc_fingerprint,
    doc_jaccard_pairs,
    doc_langid,
    doc_minhash_lsh_pairs,
    doc_quality,
    doc_simhash,
    doc_simhash_pairs,
    doc_token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank", "en"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank", "en"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat near the river bank", "en"),  # near dup of 0
        (3, "der schnelle braune fuchs springt nicht das ist und der hund", "de"),
        (4, "el gato que la los una de casa grande azul verde rojo", "es"),
        (5, "completely different words entirely unrelated content here talking about databases", "en"),
        (6, "", "en"),                                                                 # empty
        (7, "short", "en"),                                                            # single token
    ]
    return spark.createDataFrame(
        [(i, t, lang, "src", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).cache()


def test_exact_dup(spark, docs):
    got = {(r["doc_id"], r["cluster_id"]) for r in doc_exact_dup_clusters(docs).collect()}
    assert got == {(0, 0), (1, 0)}


def test_jaccard_pairs_brute_force(spark, docs):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in doc_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert (0, 5) not in pairs


def test_minhash_lsh_matches_brute_force(spark, docs):
    """LSH + verification must find exactly the brute-force pairs above the
    threshold (the verify step makes precision exact; recall is the only
    LSH-dependent part, and at j>=0.5 with 16x4 banding it is ~1)."""
    brute = {
        (r["doc_id_a"], r["doc_id_b"], round(r["jaccard"], 9))
        for r in doc_jaccard_pairs(
            docs, threshold=0.5, max_block_size=10_000
        ).collect()
    }
    lsh = {
        (r["doc_id_a"], r["doc_id_b"], round(r["jaccard"], 9))
        for r in doc_minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    assert lsh == brute


def test_simhash_properties(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in doc_simhash(docs).collect()}
    assert sh[0] == sh[1]          # identical text -> identical simhash
    assert sh[6] == 0              # empty text sentinel
    assert sh[0] != sh[5]          # different text -> different simhash


def test_simhash_pairs(spark, docs):
    got = {(r["doc_id_a"], r["doc_id_b"]): r["hamming"] for r in
           doc_simhash_pairs(docs, max_hamming=3).collect()}
    assert got.get((0, 1)) == 0
    assert (0, 5) not in got


def test_simhash_pairs_empty_doc_skew_guard(spark):
    """Planted skew: hundreds of empty docs all share the sentinel simhash 0
    and would collide on ALL FOUR chunk keys — a planted n^2 hot bucket.
    The sentinel route-off must (a) keep them out of the chunk join entirely
    and (b) leave the non-empty pair output unchanged; the salt bound caps
    every surviving chunk block."""
    from translink.blocking import with_salt

    base = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "completely different words entirely unrelated content here"),
    ]
    planted = base + [(100 + i, "") for i in range(500)]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in planted],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    cfg = LinkConfig(max_block_size=64)
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in doc_simhash_pairs(df, max_hamming=3, cfg=cfg).collect()
    }
    # empty docs never pair here (they belong to doc_exact_dup_clusters)...
    assert all(a < 100 and b < 100 for a, b in got)
    # ...and the non-empty output is exactly the no-skew baseline
    assert got == {(0, 1): 0}
    # the salt bound holds on the chunk blocks that DO reach the join
    sh = doc_simhash(df).filter(F.col("simhash") != 0)
    chunks = sh.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), i -> cast(shiftright(simhash, i * 16) & 65535 as int))"
            )
        ).alias("chunk_id", "chunk"),
    )
    salted = with_salt(chunks, ["chunk_id", "chunk"], cfg, id_col="doc_id")
    per_sub = (
        salted.groupBy("chunk_id", "chunk", "salt").count().agg(F.max("count")).first()[0]
    )
    assert per_sub <= cfg.max_block_size


def test_exact_dup_digest_window_null_and_empty(spark):
    """Digest-keyed window (xxhash64+md5 instead of raw text): same clusters,
    and null text never merges with empty text."""
    df = spark.createDataFrame(
        [(0, "x"), (1, "x"), (2, ""), (3, ""), (4, None), (5, None), (6, "y")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["cluster_id"], r["group_size"])
           for r in doc_exact_dup_clusters(df).collect()}
    assert got == {(0, 0, 2), (1, 0, 2), (2, 2, 2), (3, 2, 2), (4, 4, 2), (5, 4, 2)}


def test_entropy_ordering(spark):
    """Uniform character distribution has maximal entropy; repetitive text
    lower; single-symbol zero (the reference's entropy tests,
    src/pipeline/stats.rs:419-431 / tests/phase4_test.rs:210-238)."""
    from translink.textops import doc_entropy

    rows = [
        (0, "abcdefgh"),       # 8 distinct chars, uniform -> 3 bits
        (1, "aaaaaaab"),       # skewed
        (2, "aaaaaaaa"),       # single symbol -> 0
        (3, ""),               # empty -> 0
        (4, "aAbB 12!"),       # class histogram check
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in doc_entropy(df).collect()}
    assert abs(got[0]["entropy_bits"] - 3.0) < 1e-9
    assert got[0]["entropy_bits"] > got[1]["entropy_bits"] > got[2]["entropy_bits"]
    assert got[2]["entropy_bits"] == 0.0
    assert got[3]["entropy_bits"] == 0.0
    r4 = got[4]
    assert (r4["n_lower"], r4["n_upper"], r4["n_digit"],
            r4["n_space"], r4["n_punct"], r4["n_other"]) == (2, 2, 2, 1, 1, 0)
    # histogram classes partition the text exactly
    for r in got.values():
        assert (r["n_lower"] + r["n_upper"] + r["n_digit"] + r["n_space"]
                + r["n_punct"] + r["n_other"]) == r["n_chars_measured"]


def test_entropy_arrow_parity(spark):
    """The Arrow kernel (public default, zero shuffle) must match the
    expression form (oracle path) value-for-value: identical integer class
    counts, entropy equal to float ulp (identical summation order — counts
    ascending by codepoint)."""
    from translink.textops import doc_entropy

    rows = [
        (0, "abcdefgh"),
        (1, "aaaaaaab"),
        (2, ""),
        (3, None),
        (4, "aAbB 12!\t\n~[`{"),
        (5, "héllo wörld ünïcode ✓ — dash"),   # non-ASCII codepoints
        (6, "the quick brown fox " * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expr = {r["doc_id"]: r for r in doc_entropy(df, method="expr").collect()}
    arrow = {r["doc_id"]: r for r in doc_entropy(df, method="arrow").collect()}
    assert expr.keys() == arrow.keys()
    for k in expr:
        e, a = expr[k], arrow[k]
        for col in ("n_chars_measured", "n_lower", "n_upper", "n_digit",
                    "n_space", "n_punct", "n_other"):
            assert a[col] == e[col], (k, col, a[col], e[col])
        assert abs(a["entropy_bits"] - e["entropy_bits"]) <= 2e-9, (
            k, a["entropy_bits"], e["entropy_bits"]
        )


def test_langid(spark, docs):
    got = {r["doc_id"]: r["lang_guess"] for r in doc_langid(docs).collect()}
    assert got[0] == "en"
    assert got[3] == "de"
    assert got[4] == "es"
    assert got[6] == "und"


def test_quality(spark, docs):
    got = {r["doc_id"]: r for r in doc_quality(docs).collect()}
    assert got[0]["n_tokens"] == 13
    assert got[6]["n_tokens"] == 0
    assert 0.0 <= got[0]["punct_ratio"] < 0.05
    # repetitive text ('the' x3) has lower unique-token ratio than doc 5
    assert got[0]["uniq_token_ratio"] < got[5]["uniq_token_ratio"]


def test_token_stats(spark, docs):
    got = {r["doc_id"]: r for r in doc_token_stats(docs).collect()}
    assert got[0]["n_tokens"] == 13
    assert got[0]["n_unique_tokens"] == 11  # 'the' x3
    assert got[6]["total_token_chars"] == 0


def test_fingerprint(spark, docs):
    got = {r["doc_id"]: r for r in doc_fingerprint(docs).collect()}
    assert got[0]["fingerprint_md5"] == got[1]["fingerprint_md5"]
    assert got[0]["fingerprint_xx64"] == got[1]["fingerprint_xx64"]
    assert got[0]["fingerprint_md5"] != got[2]["fingerprint_md5"]
    assert len(got[0]["fingerprint_prefix"]) == 8


# -- repetition signals ------------------------------------------------------

def test_repetition_known_values(spark):
    from translink.textops import doc_repetition

    df = spark.createDataFrame(
        [
            (0, "a a a a"),            # one token repeated 4x
            (1, "a b a b a b"),        # top bigram 'a b' x3 of 5 bigrams
            (2, "w x y z"),            # all unique
            (3, ""),                   # empty
            (4, None),                 # null
            (5, "solo"),               # single token -> no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in doc_repetition(df, method="expr").collect()}
    assert got[0]["n_tokens"] == 4 and got[0]["top_token_frac"] == 1.0
    assert got[0]["n_bigrams"] == 3 and got[0]["dup_bigram_frac"] == 2 / 3
    assert got[1]["top_bigram_frac"] == 3 / 5           # 'a b' x3, 'b a' x2
    assert got[1]["dup_bigram_frac"] == 3 / 5           # 5 bigrams, 2 distinct
    assert got[2]["top_token_frac"] == 1 / 4 and got[2]["dup_bigram_frac"] == 0.0
    for i in (3, 4):
        assert got[i]["n_tokens"] == 0 and got[i]["top_token_frac"] == 0.0
    assert got[5]["n_bigrams"] == 0 and got[5]["top_bigram_frac"] == 0.0


def test_repetition_arrow_expr_parity(spark, docs):
    """Bigram direction matters: the kernel's adjacent-hash mix must not be
    symmetric, and every ratio must equal the expression form bit-for-bit."""
    from translink.textops import doc_repetition

    extra = spark.createDataFrame(
        [(100, "x y x y x"), (101, "y x y x y"), (102, "p q q p p q")],
        "doc_id long, text string",
    ).selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
                 "length(text) AS n_chars")
    corpus = docs.unionByName(extra)
    exp = {r["doc_id"]: tuple(r) for r in doc_repetition(corpus, method="expr").collect()}
    arr = {r["doc_id"]: tuple(r) for r in doc_repetition(corpus, method="arrow").collect()}
    assert exp == arr


# -- passage-level dedup -----------------------------------------------------

def test_passage_stats_known_values(spark):
    from translink.textops import doc_passage_stats

    base = " ".join(f"t{i}" for i in range(16))         # one full passage
    uniq = " ".join(f"u{i}" for i in range(16))
    df = spark.createDataFrame(
        [
            (0, base + " " + uniq),    # passages: [base, uniq]
            (1, base),                 # duplicate of doc 0's first passage
            (2, "tail only"),          # one short (tail) passage
            (3, ""),                   # no tokens -> zero passages
        ],
        "doc_id long, text string",
    )
    for method in ("expr", "hash"):
        got = {r["doc_id"]: r for r in doc_passage_stats(df, method=method).collect()}
        assert got[0]["n_passages"] == 2
        assert got[0]["n_dup_passages"] == 1            # base passage occurs twice
        assert got[0]["n_redundant_passages"] == 0      # doc 0 holds the canonical copy
        assert got[0]["dup_passage_frac"] == 0.5
        assert got[1]["n_dup_passages"] == 1 and got[1]["n_redundant_passages"] == 1
        assert got[2]["n_passages"] == 1 and got[2]["n_dup_passages"] == 0
        assert got[3]["n_passages"] == 0 and got[3]["dup_passage_frac"] == 0.0


def test_passage_stats_hash_expr_parity(spark, docs):
    from translink.textops import doc_passage_stats

    exp = {r["doc_id"]: tuple(r)
           for r in doc_passage_stats(docs, passage_tokens=4, method="expr").collect()}
    hsh = {r["doc_id"]: tuple(r)
           for r in doc_passage_stats(docs, passage_tokens=4, method="hash").collect()}
    assert exp == hsh
    # the shared 'the quick brown fox...' docs must show cross-doc passage dups
    assert exp[0][2] > 0  # n_dup_passages


def test_doc_dedup_keep_transitive(spark):
    """A near-dup of a near-dup drops even when the endpoints\' own Jaccard
    misses the threshold: 0-1 exact, 0-2 near (J=.71), 2-3 near (J=.50),
    but J(0,3)=.33 < threshold => still one component {0,1,2,3}, keeper 0."""
    from translink.textops import doc_dedup_keep

    toks = [f"tok{i:02d}" for i in range(20)]
    def variant(*changes):
        t = list(toks)
        for pos in changes:
            t[pos] = f"xxx{pos:02d}"
        return " ".join(t)

    rows = [
        (0, variant(), "en"),
        (1, variant(), "en"),            # exact dup of 0
        (2, variant(5), "en"),           # near dup of 0/1
        (3, variant(5, 10, 15), "en"),   # near dup of 2, NOT of 0
        (4, "totally unrelated content about spark query planning", "en"),
        (5, None, "en"),                 # null text singleton
    ]
    df = spark.createDataFrame(
        [(i, t, lang, "src", len(t or "")) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["keep"])
           for r in doc_dedup_keep(df, threshold=0.5).collect()}
    assert len(got) == 6                       # every doc gets a verdict
    assert got[0] == (0, True)
    assert got[1] == (0, False)
    assert got[2] == (0, False)
    assert got[3] == (0, False)                # transitive: via 2
    assert got[4] == (4, True)
    assert got[5] == (5, True)
    # sanity: direct jaccard 0<->3 is below the threshold (the closure did it)
    direct = doc_jaccard_pairs(df, threshold=0.5).collect()
    assert not any({r["doc_id_a"], r["doc_id_b"]} == {0, 3} for r in direct)


def test_doc_line_dedup(spark):
    """Lines repeated across >= min_docs distinct documents are stripped
    from every document; order of survivors is preserved; empty lines are
    never treated as boilerplate."""
    from translink.textops import doc_line_dedup

    banner = "COOKIE BANNER accept all"
    footer = "copyright 2026 example inc"
    rows = [
        (0, f"{banner}\nunique alpha content\n\n{footer}"),
        (1, f"{banner}\nunique beta content\n{footer}"),
        (2, f"{banner}\nunique gamma content\n{footer}"),
        (3, "totally unique document\nwith its own two lines"),
        (4, None),
        (5, banner),                       # document that IS one banner line
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t or "")) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r.asDict() for r in doc_line_dedup(df, min_docs=3).collect()}
    assert got[0]["clean_text"] == "unique alpha content\n"   # empty line kept
    assert got[0]["n_lines"] == 4 and got[0]["n_stripped"] == 2
    assert got[1]["clean_text"] == "unique beta content"
    assert got[3]["n_stripped"] == 0
    assert got[3]["clean_text"] == "totally unique document\nwith its own two lines"
    assert got[4]["clean_text"] == "" and got[4]["n_lines"] == 1  # null -> ['']
    assert got[5]["clean_text"] == "" and got[5]["n_stripped"] == 1
    assert set(got) == {0, 1, 2, 3, 4, 5}  # every doc gets a verdict


def test_bpe_token_stats(spark):
    from translink.textops import doc_bpe_token_stats

    rows = [
        (0, "I'll say it's 42 tokens, right?"),
        (1, ""),
        (2, None),
        (3, "hello hello hello"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t or "")) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r.asDict() for r in doc_bpe_token_stats(df).collect()}
    # I | 'll | ' say' | ' it' | 's | ' 42' | ' tokens' | , | ' right' | ?
    assert got[0]["n_bpe_pretokens"] == 10
    assert got[0]["n_pretokens_raw"] == 10       # no pure-whitespace runs
    assert got[1]["n_bpe_pretokens"] == 0
    assert got[2]["n_bpe_pretokens"] == 0
    assert got[3]["n_bpe_pretokens"] == 3        # hello, ' hello', ' hello'
    assert got[3]["n_unique_pretokens"] == 2     # 'hello' != ' hello'


def test_corpus_top_ngrams_known_values(spark):
    from translink.textops import corpus_top_ngrams

    rows = [
        (1, "the quick brown fox. The quick brown dog"),
        (2, "THE QUICK brown cat"),
        (3, "xy"),          # < n tokens: contributes nothing
        (4, None),          # null text: contributes nothing
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["ngram"]: (r["n_occurrences"], r["n_docs"])
        for r in corpus_top_ngrams(docs, n=3, k=2).collect()
    }
    # "the quick brown" occurs twice in doc 1 and once in doc 2; the second
    # slot goes to the lexicographically smallest of the count-1 grams
    assert got["the quick brown"] == (3, 2)
    assert got["brown fox the"] == (1, 1)


def test_corpus_top_ngrams_tie_break_is_total(spark):
    from translink.textops import corpus_top_ngrams

    docs = spark.createDataFrame(
        [(1, "b b b"), (2, "a a a"), (3, "c c c")],
        "doc_id long, text string",
    )
    grams = [r["ngram"] for r in corpus_top_ngrams(docs, n=3, k=2).collect()]
    assert grams == ["a a a", "b b b"]  # equal counts -> gram asc


def test_source_percentiles_match_numpy_definition(spark):
    import math

    from translink.textops import doc_source_percentiles

    lengths = {"s0": [5, 1, 9, 3, 7], "s1": list(range(1, 101))}
    rows, i = [], 0
    for src, ls in lengths.items():
        for n in ls:
            rows.append((i, src, n))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r["source"]: r.asDict() for r in doc_source_percentiles(docs).collect()}

    for src, ls in lengths.items():
        s = sorted(ls)
        n = len(s)
        exp = {p: s[math.ceil(p * n) - 1] for p in (0.5, 0.9, 0.99)}
        assert got[src]["n_docs"] == n
        assert got[src]["min_chars"] == s[0]
        assert got[src]["max_chars"] == s[-1]
        assert got[src]["p50_chars"] == exp[0.5]
        assert got[src]["p90_chars"] == exp[0.9]
        assert got[src]["p99_chars"] == exp[0.99]


def test_source_profile_sketch_pins_exact_operators(spark):
    """The sketch profile's correctness pin (it has no SQL oracle): GK
    quantiles degrade to an exact buffer for groups smaller than
    ``accuracy`` and must then equal doc_source_percentiles' discrete
    ceil(p*n) definition bit-for-bit; HLL++ distinct must land within 3
    standard errors; count/min/max/total are exact aggregates."""
    from translink.textops import (
        doc_source_percentiles, doc_source_profile_sketch,
    )

    rows, i = [], 0
    for src, ls in {"s0": [5, 1, 9, 3, 7], "s1": list(range(1, 101))}.items():
        for n in ls:
            # every third text duplicated -> distinct < count
            rows.append((i, src, f"t{i % max(2, i // 3 + 1)}", n))
            i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    exact = {r["source"]: r.asDict()
             for r in doc_source_percentiles(docs).collect()}
    sketch = {r["source"]: r.asDict()
              for r in doc_source_profile_sketch(docs, rsd=0.02).collect()}
    true_distinct = {
        r["source"]: r["d"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct("text").alias("d")).collect()
    }
    assert set(sketch) == set(exact)
    for src, e in exact.items():
        k = sketch[src]
        assert k["n_docs"] == e["n_docs"]
        assert k["min_chars"] == e["min_chars"]
        assert k["max_chars"] == e["max_chars"]
        for col in ("p50_chars", "p90_chars", "p99_chars"):
            assert k[col] == e[col], (src, col)
        td = true_distinct[src]
        assert abs(k["approx_distinct_texts"] - td) <= max(1, 3 * 0.02 * td)


def test_source_profile_sketch_skips_null_rows(spark):
    """NULL n_chars/text rows feed neither sketch (Spark aggregate
    semantics) but still count in n_docs; an all-NULL source yields NULL
    quantiles, not a failure."""
    from translink.textops import doc_source_profile_sketch

    docs = spark.createDataFrame(
        [
            (0, "s", "a", 10),
            (1, "s", None, None),
            (2, None, None, None),
        ],
        "doc_id long, source string, text string, n_chars long",
    )
    got = {r["source"]: r.asDict()
           for r in doc_source_profile_sketch(docs).collect()}
    assert got["s"]["n_docs"] == 2
    assert got["s"]["p50_chars"] == 10
    assert got["s"]["approx_distinct_texts"] == 1
    assert got[None]["n_docs"] == 1
    assert got[None]["p50_chars"] is None
    assert got[None]["approx_distinct_texts"] == 0


def test_curation_verdict_gates(spark):
    from translink.textops import doc_curation_verdict

    en = (
        "the quick brown fox jumps over the lazy dog and then walks home "
        "with many other common words that the profile recognizes easily"
    )
    rows = [
        (1, en + " variant one"),
        (2, en + " variant one"),            # exact dup of 1 -> dropped
        (3, "!!!???!!!***###@@@%%%&&&"),      # pure punctuation -> quality fail
        (4, "zzz qqq xxx vvv kkk www"),       # no profile markers -> lang fail
        (5, en + " a genuinely different continuation of the text"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r.asDict() for r in doc_curation_verdict(docs).collect()}

    assert got[1]["keep_dedup"] and not got[2]["keep_dedup"]
    assert got[2]["cluster_id"] == got[1]["cluster_id"] == 1
    assert not got[3]["quality_ok"] and got[1]["quality_ok"]
    assert not got[4]["lang_ok"] and got[1]["lang_ok"]
    assert got[1]["keep"]
    assert not got[2]["keep"] and not got[3]["keep"] and not got[4]["keep"]
    # every gate must pass for keep
    for r in got.values():
        assert r["keep"] == (r["keep_dedup"] and r["quality_ok"] and r["lang_ok"])


def test_url_stats_known_values(spark):
    """Pins the regression where the URL-char fold re-embedded the pattern
    in a SQL string and the literal parser turned [^\\s]+ into [^s]+ (URL
    runs then swallowed following words up to the next 's')."""
    from translink.textops import doc_url_stats

    rows = [
        (1, "see https://a.example/x then more words after"),
        (2, "no links at all in this one"),
        (3, "http://h1.com/a and http://h1.com/b and https://h2.org/c"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in doc_url_stats(docs).collect()}

    t1 = rows[0][1]
    assert got[1]["n_urls"] == 1 and got[1]["n_unique_hosts"] == 1
    assert abs(got[1]["url_char_frac"] - len("https://a.example/x") / len(t1)) < 1e-12
    assert got[2]["n_urls"] == 0 and got[2]["url_char_frac"] == 0.0
    assert got[3]["n_urls"] == 3 and got[3]["n_unique_hosts"] == 2
    assert got[4]["n_urls"] == 0 and got[4]["url_char_frac"] == 0.0


def test_doc_jaccard_pairs_rejects_unknown_method(spark):
    """A typo'd method must raise, not silently run the ~15x-slower
    interpreted expression path (siblings already raise)."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "en", "a b c")], "doc_id long, lang string, text string"
    )
    with _pytest.raises(ValueError, match="unknown method"):
        doc_jaccard_pairs(docs, method="arow")
