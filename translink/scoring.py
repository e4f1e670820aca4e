"""Stage 4 — vectorized pairwise similarity scoring.

The reference blends several per-pair similarity factors into one score
(0.4*SimHash-Hamming + 0.4*cosine(histogram) + 0.2*entropy-closeness,
``src/pipeline/stats.rs:237-264``). Our blend, per the north star, is
token-Jaccard + Levenshtein + Jaro-Winkler:

  - token_jaccard   — JVM: ``array_intersect``/``array_union`` sizes.
  - levenshtein_sim — JVM: built-in ``levenshtein`` on capped text.
  - jaro_winkler    — the one computation Spark lacks: an Arrow-batched
    pandas UDF (P6/U1 discipline: batch in, batch out, no per-row Python
    crossing the JVM boundary; texts capped at cfg.jw_text_cap so per-pair
    cost is O(cap^2) worst case and independent of document size).

Edges = pairs with blended score >= cfg.threshold (analog of
similarity_threshold 85.0, reference ``src/pipeline/stats.rs:44``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from translink.config import LinkConfig
from translink.signatures import shingles_expr


def _jaro_winkler(s: str, t: str, prefix_weight: float = 0.1) -> float:
    """Plain-Python Jaro-Winkler on one pair (runs inside an Arrow batch)."""
    if s == t:
        return 1.0
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    match_dist = max(ls, lt) // 2 - 1
    s_matched = [False] * ls
    t_matched = [False] * lt
    matches = 0
    for i, ch in enumerate(s):
        lo = max(0, i - match_dist)
        hi = min(lt, i + match_dist + 1)
        for j in range(lo, hi):
            if not t_matched[j] and t[j] == ch:
                s_matched[i] = t_matched[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(ls):
        if s_matched[i]:
            while not t_matched[j]:
                j += 1
            if s[i] != t[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    jaro = (
        matches / ls + matches / lt + (matches - transpositions) / matches
    ) / 3.0
    prefix = 0
    for a, b in zip(s, t):
        if a != b or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * prefix_weight * (1.0 - jaro)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler over two text columns."""
    return pd.Series(
        [_jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )


def jaccard_from_arrays(a: str = "shingles_a", b: str = "shingles_b"):
    """Jaccard of two precomputed shingle-array columns. Preferred at scale:
    shingles are computed once per record before the pair join (O(n) UDF-free
    work) instead of four times per candidate pair (O(pairs))."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    # union == 0 (neither side has a single shingle) is ABSENCE of
    # evidence, not perfect similarity: byte-identical texts are the exact
    # path's job, and scoring empty-vs-empty as 1.0 falsely merged
    # unrelated conversations whose text has no tokens in the shingle
    # alphabet. The SQL oracles encode the same 0.0 branch.
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def token_jaccard_expr(
    a: str = "canon_text_a", b: str = "canon_text_b", n: int = 3
):
    """Word n-gram shingle Jaccard as a pure JVM expression.

    Shingles (not unigrams) so word *order* matters and two texts drawing on
    the same vocabulary don't saturate to 1.0 — the same set family the
    MinHash signature estimates, keeping blocker recall and scorer aligned.
    """
    sa = shingles_expr(a, n)
    sb = shingles_expr(b, n)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(F.array_union(sa, sb))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def levenshtein_sim_expr(cap: int, a: str = "canon_text_a", b: str = "canon_text_b"):
    """1 - normalized edit distance on text capped at ``cap`` chars (JVM)."""
    sa, sb = f"substring({a}, 1, {cap})", f"substring({b}, 1, {cap})"
    return F.expr(
        f"1.0d - levenshtein({sa}, {sb}) / greatest(length({sa}), length({sb}), 1)"
    )


def jaccard_lower_bound(cfg: LinkConfig, include_jaro_winkler: bool = True) -> float:
    """Minimum token_jaccard a pair needs to possibly reach cfg.threshold,
    assuming the other components score a perfect 1.0. Pairs below it can be
    dropped BEFORE the expensive Levenshtein/Jaro-Winkler work without
    changing the thresholded edge set — the reference's cheap-to-expensive
    cascade (P1, README.md:19-47) applied inside the scorer."""
    w_rest = cfg.w_levenshtein + (cfg.w_jaro_winkler if include_jaro_winkler else 0.0)
    w_sum = cfg.w_jaccard + w_rest
    if cfg.w_jaccard <= 0:
        # jaccard carries no weight -> it can exclude nothing; validate()
        # allows a zero weight (only the SUM must be positive), so this
        # must degrade to "no cascade bound", not divide by zero
        return 0.0
    return max(0.0, (cfg.threshold * w_sum - w_rest) / cfg.w_jaccard)


def score_pairs(
    pairs: DataFrame,
    cfg: LinkConfig | None = None,
    include_jaro_winkler: bool = True,
    cascade: bool = False,
) -> DataFrame:
    """Score candidate pairs; adds component columns and blended ``score``.

    The exact-duplicate fast path short-circuits the blend: byte-equal
    canonical texts score 1.0 without touching the pandas UDF (the analog of
    the reference's early ``Duplicates`` termination,
    ``src/pipeline/mod.rs:92-95``).

    ``cascade=True`` drops pairs whose token_jaccard already rules out
    reaching ``cfg.threshold`` before Levenshtein/Jaro-Winkler run —
    edge-set-equivalent to full scoring but skips the O(len^2) work for the
    (vast) majority of candidate pairs. Use for edge generation; leave off
    when every pair's full score is the deliverable.
    """
    cfg = cfg or LinkConfig()
    exact = F.col("canon_text_a") == F.col("canon_text_b")
    if "shingles_a" in pairs.columns and "shingles_b" in pairs.columns:
        jac = jaccard_from_arrays()
    else:
        jac = token_jaccard_expr(n=cfg.shingle_size)
    scored = pairs.withColumn("token_jaccard", jac)
    if cascade:
        scored = scored.filter(
            F.col("token_jaccard")
            >= jaccard_lower_bound(cfg, include_jaro_winkler)
        )
    scored = scored.withColumns({
        "levenshtein_sim": levenshtein_sim_expr(cfg.lev_text_cap),
    })
    if include_jaro_winkler:
        jw = F.when(exact, F.lit(1.0)).otherwise(
            jaro_winkler_udf(
                F.substring("canon_text_a", 1, cfg.jw_text_cap),
                F.substring("canon_text_b", 1, cfg.jw_text_cap),
            )
        )
        w_sum = cfg.w_jaccard + cfg.w_levenshtein + cfg.w_jaro_winkler
        blend = (
            F.col("token_jaccard") * cfg.w_jaccard
            + F.col("levenshtein_sim") * cfg.w_levenshtein
            + F.col("jaro_winkler") * cfg.w_jaro_winkler
        ) / w_sum
    else:
        jw = None
        w_sum = cfg.w_jaccard + cfg.w_levenshtein
        blend = (
            F.col("token_jaccard") * cfg.w_jaccard
            + F.col("levenshtein_sim") * cfg.w_levenshtein
        ) / w_sum
    if jw is not None:
        scored = scored.withColumn("jaro_winkler", jw)
    return scored.withColumn(
        "score", F.when(exact, F.lit(1.0)).otherwise(blend)
    )


def edges(scored: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Thresholded similarity edges for clustering."""
    cfg = cfg or LinkConfig()
    return (
        scored
        .filter(F.col("score") >= cfg.threshold)
        .select(
            F.col("conv_id_a").alias("src"),
            F.col("conv_id_b").alias("dst"),
            "score",
        )
    )
