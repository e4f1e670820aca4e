"""Full-fidelity character-frequency histograms + statistical similarity blend.

Reference parity: the reference keeps the FULL 256-bucket byte-frequency
distribution per file (``src/pipeline/stats.rs:155-182``: per-block
``HashMap<u8, u32>`` maps combined into a 256-slot probability vector) and
blends three fingerprint components into one pairwise score
(``src/pipeline/stats.rs:236-265`` ``calculate_similarity``): SimHash
hamming 0.4 + frequency-distribution cosine 0.4 + entropy closeness 0.2,
each scaled to 0-100.

The text analog here keeps the full per-CODEPOINT histogram (documents are
text, not raw bytes; ``doc_entropy`` already collapses the same distribution
to 6 class columns — this module exposes it whole). Two execution forms per
operator, the established pattern from ``doc_entropy``/``doc_jaccard_pairs``:

- ``method='arrow'`` (default, the scale path): one vectorized kernel pass
  per Arrow batch — per-(row, codepoint) counts from a single ``np.unique``
  over the combined key ``row_idx << 21 | codepoint``; zero shuffle for the
  per-doc histogram, and the pair join ships compact (codepoint, count)
  arrays (<= distinct-chars entries, ~1-2 KB) instead of document text.
- ``method='expr'``: explode + hash-aggregate, fully ANSI-SQL-reproducible
  for the DuckDB oracle. Never the public default (per-character shuffle).

All histogram quantities are exact BIGINT counts, so dot products and
squared norms are exact integers and the derived doubles (one IEEE multiply,
sqrt, divide per pair, identical op order in Spark / numpy / DuckDB, NO
``round()`` — the engines' round implementations disagree in the last digit)
are bit-reproducible cross-engine. The expression form is oracle-checked;
the Arrow form's cosine lane is bit-identical to it, while its entropy lane
(Arrow kernel) is ulp-exact only, so the Arrow pair query is rows-only with
pytest parity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

from translink.blocking import with_salt
from translink.config import LinkConfig

_ID = "doc_id"

# reference calculate_similarity weights (src/pipeline/stats.rs:262-264)
REF_WEIGHT_SIMHASH = 0.4
REF_WEIGHT_COSINE = 0.4
REF_WEIGHT_ENTROPY = 0.2
# entropy closeness normalizer: reference uses 8.0 (max bits of a byte
# distribution, src/pipeline/stats.rs:258-259); kept for the text analog.
# Per-codepoint entropy is UNBOUNDED (CJK text routinely exceeds 8 bits),
# so the closeness term is clamped at 0 rather than going negative and
# pushing stat_sim off its documented 0-100 scale.
ENTROPY_SPAN_BITS = 8.0

from translink.textops import _parallelism  # noqa: E402  (shared helper)


def _char_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ch, c) exploded per-codepoint counts — the expression-form
    histogram (ANSI-SQL twin: unnest(string_split_regex(txt, ''))). Empty
    docs contribute no rows."""
    text = F.coalesce("text", F.lit(""))
    return (
        docs.select(_ID, F.explode(F.split(text, "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy(_ID, "ch")
        .agg(F.count("*").cast("long").alias("c"))
    )


def _hist_struct_type():
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    return StructType([
        StructField("keys", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
        StructField("n_chars", LongType()),
        StructField("distinct_chars", LongType()),
        StructField("top_char", StringType()),
        StructField("top_count", LongType()),
        StructField("hist_l2_sq", LongType()),
    ])


@pandas_udf(_hist_struct_type())
def _hist_kernel(texts: pd.Series) -> pd.DataFrame:
    """Full per-codepoint histogram per document, vectorized over the Arrow
    batch (reference kernel: byte-frequency maps per block,
    ``src/pipeline/stats.rs:155-176``).

    One UTF-32 decode of the whole batch; per-(row, codepoint) counts from a
    single ``np.unique`` over ``row_idx << 21 | codepoint`` (codepoints fit
    21 bits) — the same combined-key trick as ``_entropy_kernel``. Keys come
    back (row, codepoint)-ascending, so per-row slices are already sorted by
    codepoint (== UTF-8 string order, which UTF-8 preserves). Top char uses
    max-count-then-min-codepoint tie-breaking, matching the expression form's
    ``min(ch) WHERE c = max(c)``.
    """
    import numpy as np

    n_rows = len(texts)
    filled = ["" if t is None else t for t in texts]
    lens = np.fromiter((len(t) for t in filled), dtype=np.int64, count=n_rows)
    keys_out: list = [[]] * n_rows
    cnts_out: list = [[]] * n_rows
    distinct = np.zeros(n_rows, dtype=np.int64)
    l2 = np.zeros(n_rows, dtype=np.int64)
    top_cnt = np.zeros(n_rows, dtype=np.int64)
    top_char = [""] * n_rows
    if int(lens.sum()):
        cp = np.frombuffer("".join(filled).encode("utf-32-le"), dtype=np.uint32)
        row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        uk, counts = np.unique(
            (row_idx << np.int64(21)) | cp.astype(np.int64), return_counts=True
        )
        urow = (uk >> np.int64(21)).astype(np.intp)
        ucp = (uk & np.int64((1 << 21) - 1))
        counts = counts.astype(np.int64)
        distinct = np.bincount(urow, minlength=n_rows).astype(np.int64)
        l2 = np.bincount(urow, weights=(counts * counts).astype(np.float64),
                         minlength=n_rows).astype(np.int64)
        # first entry per row under (row asc, count desc, codepoint asc)
        order = np.lexsort((ucp, -counts, urow))
        starts = np.flatnonzero(np.r_[True, urow[order][1:] != urow[order][:-1]])
        lead = order[starts]
        top_cnt[urow[lead]] = counts[lead]
        for i, cpv in zip(urow[lead], ucp[lead]):
            top_char[i] = chr(int(cpv))
        # per-row (codepoint, count) slices — uk is (row, cp)-ascending
        bounds = np.r_[0, np.cumsum(np.bincount(urow, minlength=n_rows))]
        for i in range(n_rows):
            lo, hi = bounds[i], bounds[i + 1]
            keys_out[i] = ucp[lo:hi]
            cnts_out[i] = counts[lo:hi]
    return pd.DataFrame({
        "keys": keys_out, "cnts": cnts_out, "n_chars": lens,
        "distinct_chars": distinct, "top_char": top_char,
        "top_count": top_cnt, "hist_l2_sq": l2,
    })


def doc_char_histogram(
    docs: DataFrame, method: str = "arrow", include_arrays: bool = False
) -> DataFrame:
    """Full character-frequency histogram per document (reference keeps the
    full 256-bucket byte distribution, ``src/pipeline/stats.rs:155-182``;
    ``doc_entropy`` collapses the same distribution to 6 classes — this is
    the uncollapsed fidelity surface).

    Columns: ``doc_id, n_chars, distinct_chars, top_char, top_count,
    hist_l2_sq`` — all exact integers except ``top_char`` (most frequent
    character, min-codepoint tie-break; '' for empty text). With
    ``include_arrays=True`` (arrow only) adds the full distribution as
    codepoint-ascending ``hist_keys/hist_counts`` arrays.
    """
    if method == "arrow":
        out = (
            docs.repartition(_parallelism(docs))
            .select(_ID, _hist_kernel(F.col("text")).alias("_h"))
        )
        cols = [
            _ID, "_h.n_chars", "_h.distinct_chars", "_h.top_char",
            "_h.top_count", "_h.hist_l2_sq",
        ]
        if include_arrays:
            cols += [
                F.col("_h.keys").alias("hist_keys"),
                F.col("_h.cnts").alias("hist_counts"),
            ]
        return out.select(*cols)
    if include_arrays:
        raise ValueError("include_arrays requires method='arrow'")
    cc = _char_counts(docs)
    w = Window.partitionBy(_ID)
    tops = (
        cc.withColumn("mc", F.max("c").over(w))
        .filter(F.col("c") == F.col("mc"))
        .groupBy(_ID)
        .agg(F.min("ch").alias("top_char"), F.max("mc").alias("top_count"))
    )
    stats = cc.groupBy(_ID).agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("distinct_chars"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("hist_l2_sq"),
    )
    return (
        docs.select(_ID)
        .join(stats, _ID, "left")
        .join(tops, _ID, "left")
        .select(
            _ID,
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("distinct_chars", F.lit(0)).cast("long")
            .alias("distinct_chars"),
            F.coalesce("top_char", F.lit("")).alias("top_char"),
            F.coalesce("top_count", F.lit(0)).cast("long").alias("top_count"),
            F.coalesce("hist_l2_sq", F.lit(0)).cast("long").alias("hist_l2_sq"),
        )
    )


def _dot_type():
    from pyspark.sql.types import LongType

    return LongType()


@pandas_udf(_dot_type())
def _dot_kernel(
    a_keys: pd.Series, a_cnts: pd.Series, b_keys: pd.Series, b_cnts: pd.Series
) -> pd.Series:
    """Sparse integer dot product of two codepoint-ascending histograms.
    Exact int64 arithmetic (counts are exact, products bounded by
    doc_len^2 << 2^63) — order-independent, so it is bit-identical to the
    expression form's join-and-sum."""
    import numpy as np

    out = np.zeros(len(a_keys), dtype=np.int64)
    for i in range(len(a_keys)):
        ak, bk = np.asarray(a_keys[i], dtype=np.int64), np.asarray(
            b_keys[i], dtype=np.int64
        )
        if not len(ak) or not len(bk):
            continue
        common, ia, ib = np.intersect1d(
            ak, bk, assume_unique=True, return_indices=True
        )
        if len(common):
            av = np.asarray(a_cnts[i], dtype=np.int64)[ia]
            bv = np.asarray(b_cnts[i], dtype=np.int64)[ib]
            out[i] = int(np.dot(av, bv))
    return pd.Series(out)


def _cosine_col(dot, l2a, l2b):
    """cosine with the empty-histogram convention: both empty -> 1.0 (byte-
    identical empties ARE identical), one empty -> 0.0. Each norm is cast
    to double BEFORE the multiply: an int64 product l2a*l2b overflows for
    large repetitive documents (l2 ~ n^2, so the product crosses 2^63 once
    n_a*n_b concentration passes ~9.2e18 — two ~60 KB boilerplate docs),
    while double*double of per-doc-exact norms stays finite and follows
    ONE shared IEEE op order cross-engine. NO round(): Spark's BigDecimal
    HALF_UP round and DuckDB's multiply-and-round disagree in the last
    digit on ~1% of values (measured) — rounding would BREAK determinism
    here."""
    return (
        F.when((l2a == 0) & (l2b == 0), F.lit(1.0))
        .when((l2a == 0) | (l2b == 0), F.lit(0.0))
        .otherwise(
            dot.cast("double")
            / F.sqrt(l2a.cast("double") * l2b.cast("double"))
        )
    )


def doc_stat_similarity_pairs(
    docs: DataFrame,
    threshold: float = 0.0,
    length_bucket: int = 64,
    max_block_size: int = 64,
    salt_mode: str = "rank",
    method: str = "arrow",
    include_simhash: bool = False,
) -> DataFrame:
    """Pairwise statistical-fingerprint similarity over (lang, length)
    blocks — the reference's H13 blend (``src/pipeline/stats.rs:236-265``):
    frequency-distribution cosine + entropy closeness, each 0-100, combined
    with the reference's weights.

    Blocking is identical to ``doc_jaccard_pairs`` (lang|length-bucket key,
    rank salt bounding every block at ``max_block_size``) so no block can go
    quadratic at corpus scale. Per pair:

    - ``hist_cosine``: cosine between full per-codepoint count histograms
      (reference: 256-bucket byte distributions) in [0, 1].
    - ``entropy_sim``: ``(8 - |Ha - Hb|) / 8 * 100`` (reference
      ``:258-259``), entropy in bits from ``doc_entropy``.
    - ``stat_sim``: the blend. With ``include_simhash=False`` (default, the
      ANSI-SQL-checkable profile) cosine and entropy carry the reference's
      0.4/0.2 ratio renormalized to 1: ``(2*cosine_pct + entropy_sim)/3``.
      With ``include_simhash=True`` the full reference formula
      ``0.4*simhash_sim + 0.4*cosine_pct + 0.2*entropy_sim`` (simhash
      hamming similarity, Spark-only — no SQL twin; parity via pytest).

    ``method='arrow'`` ships (codepoint, count) arrays through the pair join
    and runs the exact-integer dot kernel; ``method='expr'`` is the
    explode/join oracle twin. Identical values (exact integer dots/norms,
    one shared IEEE op order)."""
    from translink.textops import doc_entropy

    cfg = LinkConfig(max_block_size=max_block_size, salt_mode=salt_mode)
    text = F.coalesce("text", F.lit(""))
    blocked = docs.repartition(_parallelism(docs)).select(
        _ID,
        F.concat_ws(
            "|",
            F.coalesce("lang", F.lit("")),
            F.floor(F.length(text) / length_bucket).cast("string"),
        ).alias("block_key"),
    )
    salted = with_salt(blocked, ["block_key"], cfg, id_col=_ID)

    ent = doc_entropy(docs, method=method).select(_ID, "entropy_bits")
    if method == "arrow":
        hist = doc_char_histogram(docs, method="arrow", include_arrays=True) \
            .select(_ID, "hist_keys", "hist_counts", "hist_l2_sq")
        side = (
            salted.join(hist, _ID).join(ent, _ID)
            .select(_ID, "block_key", "salt", "hist_keys", "hist_counts",
                    "hist_l2_sq", "entropy_bits")
        )
        pairs = (
            side.alias("a")
            .hint("MERGE")
            .join(
                side.alias("b"),
                on=[
                    F.col("a.block_key") == F.col("b.block_key"),
                    F.col("a.salt") == F.col("b.salt"),
                    F.col(f"a.{_ID}") < F.col(f"b.{_ID}"),
                ],
            )
            .select(
                F.col(f"a.{_ID}").alias("doc_id_a"),
                F.col(f"b.{_ID}").alias("doc_id_b"),
                _dot_kernel(
                    "a.hist_keys", "a.hist_counts", "b.hist_keys",
                    "b.hist_counts",
                ).alias("dot"),
                F.col("a.hist_l2_sq").alias("l2a"),
                F.col("b.hist_l2_sq").alias("l2b"),
                F.col("a.entropy_bits").alias("ent_a"),
                F.col("b.entropy_bits").alias("ent_b"),
            )
        )
    else:
        cc = _char_counts(docs)
        hist = (
            docs.select(_ID)
            .join(
                cc.groupBy(_ID).agg(
                    F.map_from_entries(
                        F.sort_array(F.collect_list(F.struct("ch", "c")))
                    ).alias("hist"),
                    F.sum(F.col("c") * F.col("c")).cast("long")
                    .alias("hist_l2_sq"),
                ),
                _ID, "left",
            )
            .select(
                _ID,
                F.coalesce("hist", F.map_from_arrays(
                    F.array().cast("array<string>"),
                    F.array().cast("array<long>"),
                )).alias("hist"),
                F.coalesce("hist_l2_sq", F.lit(0)).cast("long")
                .alias("hist_l2_sq"),
            )
        )
        side = (
            salted.join(hist, _ID).join(ent, _ID)
            .select(_ID, "block_key", "salt", "hist", "hist_l2_sq",
                    "entropy_bits")
        )
        # integer dot via map fold (oracle twin of the join-and-sum CTE);
        # try_element_at -> NULL (not ANSI error) on missing keys
        dot_expr = F.aggregate(
            F.map_entries(F.col("a.hist")),
            F.lit(0).cast("long"),
            lambda acc, e: acc
            + e["value"]
            * F.coalesce(
                F.try_element_at(F.col("b.hist"), e["key"]), F.lit(0)
            ),
        )
        pairs = (
            side.alias("a")
            .hint("MERGE")
            .join(
                side.alias("b"),
                on=[
                    F.col("a.block_key") == F.col("b.block_key"),
                    F.col("a.salt") == F.col("b.salt"),
                    F.col(f"a.{_ID}") < F.col(f"b.{_ID}"),
                ],
            )
            .select(
                F.col(f"a.{_ID}").alias("doc_id_a"),
                F.col(f"b.{_ID}").alias("doc_id_b"),
                dot_expr.alias("dot"),
                F.col("a.hist_l2_sq").alias("l2a"),
                F.col("b.hist_l2_sq").alias("l2b"),
                F.col("a.entropy_bits").alias("ent_a"),
                F.col("b.entropy_bits").alias("ent_b"),
            )
        )

    cos = _cosine_col(F.col("dot"), F.col("l2a"), F.col("l2b"))
    # unrounded for the same cross-engine-determinism reason as _cosine_col
    ent_sim = F.greatest(
        F.lit(0.0),
        (F.lit(ENTROPY_SPAN_BITS) - F.abs(F.col("ent_a") - F.col("ent_b")))
        / F.lit(ENTROPY_SPAN_BITS) * F.lit(100.0),
    )
    scored = pairs.select(
        "doc_id_a", "doc_id_b",
        cos.alias("hist_cosine"), ent_sim.alias("entropy_sim"),
    )
    if include_simhash:
        from translink.textops import doc_simhash

        sh = doc_simhash(docs)
        scored = (
            scored.join(
                sh.select(F.col(_ID).alias("doc_id_a"),
                          F.col("simhash").alias("sh_a")), "doc_id_a")
            .join(
                sh.select(F.col(_ID).alias("doc_id_b"),
                          F.col("simhash").alias("sh_b")), "doc_id_b")
            .withColumn(
                "simhash_sim",
                (F.lit(64) - F.bit_count(F.expr("sh_a ^ sh_b")))
                .cast("double") / F.lit(64.0) * F.lit(100.0),
            )
            .select(
                "doc_id_a", "doc_id_b", "hist_cosine", "entropy_sim",
                "simhash_sim",
                (
                    F.lit(REF_WEIGHT_SIMHASH) * F.col("simhash_sim")
                    + F.lit(REF_WEIGHT_COSINE) * F.col("hist_cosine")
                    * F.lit(100.0)
                    + F.lit(REF_WEIGHT_ENTROPY) * F.col("entropy_sim")
                ).alias("stat_sim"),
            )
        )
    else:
        # cosine:entropy keep the reference's 0.4:0.2 ratio, renormalized
        scored = scored.withColumn(
            "stat_sim",
            (F.lit(2.0) * F.col("hist_cosine") * F.lit(100.0)
             + F.col("entropy_sim")) / F.lit(3.0),
        )
    return scored.filter(F.col("stat_sim") >= F.lit(float(threshold)))


# -- corpus-relative character cross-entropy (LM-filter proxy) -------------

def doc_char_crossent(docs: DataFrame, method: str = "arrow") -> DataFrame:
    """Per-document cross-entropy against the CORPUS character
    distribution — the language-model quality-filter proxy (the standard
    curation move scores each document under a model of "typical" corpus
    text and drops the tails; with no LM in the container, the corpus's
    own character unigram distribution is the model):

        H(doc, corpus) = -sum_c p_doc(c) * log2(P_corpus(c))
                       = log2(N) - sum_c c_doc(c) * log2(n_corpus(c)) / len

    Low = the document is written in the corpus's typical alphabet; high =
    atypical bytes (mojibake, binary spill, a script rare in this corpus).
    Output: (doc_id, n_chars, cross_entropy_bits); empty docs -> 0.0.

    Plan shape at scale: per-document (codepoint, count) rows — bounded by
    the document's ALPHABET, never its length — flow through one partial-
    combined aggregation for the global distribution and one sort-merge
    join back on codepoint; no per-character explode ever crosses an
    exchange in the 'arrow' method (the per-doc histogram is the map-side
    Arrow kernel ``doc_char_histogram`` already uses). The corpus total N
    is ONE bounded driver action (a 1-row aggregate, the same pattern as
    the CC fixpoint checks) — embedding it as a literal avoids both a
    broadcast (engine-wide ban) and a single-partition window.

    The log2 fold runs JVM-side in BOTH methods with a deterministic
    codepoint-ascending order and round(9), the established cross-engine
    discipline of ``doc_entropy``; the DuckDB oracle mirrors it with
    ``list(... ORDER BY cp)``.
    """
    if method == "arrow":
        per = doc_char_histogram(docs, method="arrow", include_arrays=True)
        pairs = (
            per.select(
                _ID,
                F.posexplode(F.arrays_zip("hist_keys", "hist_counts"))
                .alias("_i", "_kv"),
            )
            .select(
                _ID,
                F.col("_kv.hist_keys").cast("long").alias("cp"),
                F.col("_kv.hist_counts").cast("double").alias("c"),
            )
        )
    elif method == "expr":
        pairs = _char_counts(docs).select(
            _ID, F.ascii("ch").cast("long").alias("cp"),
            F.col("c").cast("double").alias("c"),
        )
    else:
        raise ValueError(f"unknown method {method!r}; use 'arrow' or 'expr'")

    # pairs feeds BOTH the global distribution and the per-doc join: an
    # eager local checkpoint materializes the (alphabet-bounded) rows once
    # so the histogram kernel does not re-run over the corpus per consumer
    pairs = pairs.localCheckpoint(eager=True)
    g = pairs.groupBy("cp").agg(F.sum("c").alias("n_c"))
    total = g.agg(F.sum("n_c").alias("n")).first()["n"]
    if total is None or total == 0:
        return docs.select(
            _ID,
            F.length(F.coalesce("text", F.lit(""))).cast("long").alias("n_chars"),
            F.lit(0.0).alias("cross_entropy_bits"),
        )
    import math

    log2_n = math.log2(float(total))
    ent = (
        pairs.join(g, "cp")
        .select(_ID, F.struct("cp", (F.col("c") * F.log2("n_c")).alias("term")).alias("_t"),
                "c")
        .groupBy(_ID)
        .agg(
            F.array_sort(F.collect_list("_t")).alias("_tv"),
            F.sum("c").alias("_len"),
        )
        .select(
            _ID,
            F.round(
                F.lit(log2_n)
                - F.aggregate(
                    "_tv", F.lit(0.0), lambda a, x: a + x["term"]
                ) / F.col("_len"),
                9,
            ).alias("cross_entropy_bits"),
        )
    )
    lens = docs.select(
        _ID, F.length(F.coalesce("text", F.lit(""))).cast("long").alias("n_chars")
    )
    return lens.join(ent, _ID, "left").select(
        _ID, "n_chars",
        F.coalesce("cross_entropy_bits", F.lit(0.0)).alias("cross_entropy_bits"),
    )
