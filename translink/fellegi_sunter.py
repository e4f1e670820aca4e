"""Fellegi–Sunter probabilistic record linkage (match weights + EM).

The engine's blended score (``scoring.score_pairs``) is a heuristic convex
combination; the canonical probabilistic model for record linkage is
Fellegi & Sunter 1969 ("A Theory for Record Linkage", JASA — public
paper), the model behind modern linkage engines such as the public
Splink project: each candidate pair is reduced to a discrete COMPARISON
VECTOR γ (agreement level per field), and each field level carries a
log-likelihood-ratio weight ``log2(m/u)`` where ``m = P(level | match)``
and ``u = P(level | non-match)``. The pair's match weight is the sum; the
posterior match probability follows from Bayes with the prior λ.

Parameters can be fixed (auditable, ANSI-SQL-reproducible — the oracle
path) or estimated UNSUPERVISED by expectation-maximization. The EM here
is the standard pattern-count formulation and is built for corpus scale:
ONE distributed aggregation reduces the pair set to at most
``prod(levels)`` (≤ 36 here) pattern counts, and every EM iteration is
driver-side arithmetic over that tiny table — the corpus is touched
exactly once, no per-iteration shuffle, no collect of pairs.

Comparison fields over transcript pairs (levels):
  - ``g_jac``  token-shingle Jaccard       (0: <0.5, 1: >=0.5, 2: >=0.9)
  - ``g_lev``  Levenshtein similarity      (0: <0.7, 1: >=0.7, 2: >=0.9)
  - ``g_turns`` exact turn-count agreement (0/1)
  - ``g_len``  total length within one blocking bucket (0/1)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from translink.config import LinkConfig

#: Comparison-field names -> number of agreement levels.
FIELDS: dict[str, int] = {"g_jac": 3, "g_lev": 3, "g_turns": 2, "g_len": 2}

#: Fixed default parameters (the oracle-reproducible path): chosen to be
#: sane for near-duplicate text linkage — high agreement is ~certain under
#: a match and rare under a non-match. Probabilities per level, low→high.
DEFAULT_M: dict[str, list[float]] = {
    "g_jac": [0.02, 0.18, 0.80],
    "g_lev": [0.02, 0.18, 0.80],
    "g_turns": [0.05, 0.95],
    "g_len": [0.05, 0.95],
}
DEFAULT_U: dict[str, list[float]] = {
    "g_jac": [0.90, 0.09, 0.01],
    "g_lev": [0.80, 0.15, 0.05],
    "g_turns": [0.60, 0.40],
    "g_len": [0.50, 0.50],
}
DEFAULT_LAMBDA = 0.1

_EPS = 1e-6


@dataclass
class FSParams:
    """m/u probability tables (per field, per level) and the match prior."""

    m: dict[str, list[float]] = field(
        default_factory=lambda: {k: list(v) for k, v in DEFAULT_M.items()}
    )
    u: dict[str, list[float]] = field(
        default_factory=lambda: {k: list(v) for k, v in DEFAULT_U.items()}
    )
    lam: float = DEFAULT_LAMBDA
    n_iter: int = 0          # EM iterations actually run (0 = fixed params)
    converged: bool = True

    def weights(self) -> dict[str, list[float]]:
        """Per-field, per-level log2(m/u) match weights."""
        return {
            k: [
                math.log2(max(m, _EPS) / max(u, _EPS))
                for m, u in zip(self.m[k], self.u[k])
            ]
            for k in FIELDS
        }


def comparison_vectors(scored_pairs: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Reduce scored candidate pairs to discrete comparison vectors.

    Input needs ``token_jaccard``, ``levenshtein_sim``, ``n_turns_a/b``,
    ``total_chars_a/b`` (i.e. ``score_pairs`` output over pairs carrying
    the numeric payload columns). Adds the ``g_*`` level columns; banding
    thresholds are fixed constants so the reduction is exactly
    reproducible in ANSI SQL.
    """
    cfg = cfg or LinkConfig()
    return scored_pairs.withColumns({
        "g_jac": F.when(F.col("token_jaccard") >= 0.9, F.lit(2))
                  .when(F.col("token_jaccard") >= 0.5, F.lit(1))
                  .otherwise(F.lit(0)),
        "g_lev": F.when(F.col("levenshtein_sim") >= 0.9, F.lit(2))
                  .when(F.col("levenshtein_sim") >= 0.7, F.lit(1))
                  .otherwise(F.lit(0)),
        "g_turns": F.when(F.col("n_turns_a") == F.col("n_turns_b"), F.lit(1))
                    .otherwise(F.lit(0)),
        "g_len": F.when(
            F.abs(F.col("total_chars_a") - F.col("total_chars_b"))
            <= F.lit(int(cfg.length_bucket)), F.lit(1)
        ).otherwise(F.lit(0)),
    })


def fs_weight_expr(params: FSParams | None = None) -> F.Column:
    """Match-weight column: sum over fields of the level's log2(m/u).

    The weights are computed in Python ONCE and embedded as double
    literals (no runtime log/pow), so a SQL twin embedding the same
    literals is bit-identical — engine log implementations never enter
    the comparison.
    """
    params = params or FSParams()
    w = params.weights()
    terms = []
    for k, n_levels in FIELDS.items():
        expr = F.when(F.col(k) == 0, F.lit(w[k][0]))
        for lvl in range(1, n_levels):
            expr = expr.when(F.col(k) == lvl, F.lit(w[k][lvl]))
        terms.append(expr.otherwise(F.lit(None).cast("double")))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def fs_score(gammas: DataFrame, params: FSParams | None = None) -> DataFrame:
    """Add ``match_weight`` and the Bayes posterior ``match_prob``."""
    params = params or FSParams()
    weighted = gammas.withColumn("match_weight", fs_weight_expr(params))
    prior_odds = params.lam / max(1.0 - params.lam, _EPS)
    # posterior = 1 / (1 + (1/prior_odds) * 2^-W)
    return weighted.withColumn(
        "match_prob",
        F.lit(1.0) / (
            F.lit(1.0)
            + F.lit(1.0 / max(prior_odds, _EPS))
            * F.pow(F.lit(2.0), -F.col("match_weight"))
        ),
    )


def fs_pattern_counts(gammas: DataFrame) -> list[tuple[tuple[int, ...], int]]:
    """ONE distributed aggregation: pair set -> (γ pattern, count).

    At most ``prod(levels)`` = 36 rows come back to the driver regardless
    of corpus size — this is the only pass over the pairs EM ever makes.
    """
    rows = (
        gammas.groupBy(*FIELDS).agg(F.count("*").alias("n")).collect()
    )
    return [
        (tuple(int(r[k]) for k in FIELDS), int(r["n"])) for r in rows
    ]


def fs_em_fit(
    gammas: DataFrame,
    n_iter: int = 50,
    tol: float = 1e-9,
    init: FSParams | None = None,
) -> FSParams:
    """Unsupervised EM over the pattern counts (Fellegi–Sunter §5 /
    the standard Splink formulation).

    E-step: responsibility of pattern p is
    ``r_p = λ·Π m / (λ·Π m + (1-λ)·Π u)``; M-step re-estimates λ and each
    field's m/u tables from count-weighted responsibilities. All driver
    arithmetic over ≤ 36 patterns; deterministic for a deterministic
    input (fixed init, fixed iteration order, no randomness).
    """
    counts = fs_pattern_counts(gammas)
    params = init or FSParams()
    m = {k: list(v) for k, v in params.m.items()}
    u = {k: list(v) for k, v in params.u.items()}
    lam = params.lam
    total = float(sum(n for _, n in counts)) or 1.0
    keys = list(FIELDS)
    converged = False
    it = 0
    for it in range(1, n_iter + 1):
        # E-step
        resp = []
        for pat, n in counts:
            pm, pu = lam, 1.0 - lam
            for k, lvl in zip(keys, pat):
                pm *= m[k][lvl]
                pu *= u[k][lvl]
            resp.append(pm / (pm + pu) if (pm + pu) > 0 else 0.0)
        # M-step
        new_lam = sum(r * n for r, (_, n) in zip(resp, counts)) / total
        new_m = {k: [0.0] * FIELDS[k] for k in keys}
        new_u = {k: [0.0] * FIELDS[k] for k in keys}
        wm = sum(r * n for r, (_, n) in zip(resp, counts)) or _EPS
        wu = sum((1.0 - r) * n for r, (_, n) in zip(resp, counts)) or _EPS
        for r, (pat, n) in zip(resp, counts):
            for k, lvl in zip(keys, pat):
                new_m[k][lvl] += r * n
                new_u[k][lvl] += (1.0 - r) * n
        clip = lambda x: min(max(x, _EPS), 1.0 - _EPS)  # noqa: E731
        new_m = {k: [clip(v / wm) for v in new_m[k]] for k in keys}
        new_u = {k: [clip(v / wu) for v in new_u[k]] for k in keys}
        new_lam = clip(new_lam)
        delta = abs(new_lam - lam) + sum(
            abs(a - b)
            for k in keys
            for a, b in zip(new_m[k] + new_u[k], m[k] + u[k])
        )
        m, u, lam = new_m, new_u, new_lam
        if delta < tol:
            converged = True
            break
    return FSParams(m=m, u=u, lam=lam, n_iter=it, converged=converged)


def fs_link_tables(
    a_turns: DataFrame,
    b_turns: DataFrame,
    cfg: LinkConfig | None = None,
    params: FSParams | None = None,
    min_match_prob: float = 0.95,
) -> DataFrame:
    """End-to-end probabilistic linkage of two corpora.

    Same blocking + A×B candidate generation as ``linkage.link_tables``,
    but scored by the Fellegi–Sunter model: ``params=None`` fits m/u/λ by
    EM on this corpus pair's own comparison vectors (one aggregation +
    driver EM), then pairs with posterior ≥ ``min_match_prob`` resolve to
    one-to-one matches (greedy mutual-best on the posterior). Returns
    ``(conv_id_a, conv_id_b, match_weight, match_prob)``.
    """
    from translink.canonicalize import canonicalize
    from translink.blocking import with_block_key
    from translink.linkage import link_candidate_pairs, mutual_best_matches
    from translink.scoring import score_pairs
    from translink.signatures import shingles_expr

    cfg = cfg or LinkConfig()

    def prep(turns: DataFrame) -> DataFrame:
        c = with_block_key(canonicalize(turns, cfg), cfg)
        return c.withColumn(
            "shingles", shingles_expr("canon_text", cfg.shingle_size)
        )

    pairs = link_candidate_pairs(
        prep(a_turns), prep(b_turns), cfg,
        payload_cols=["canon_text", "shingles", "n_turns", "total_chars"],
    )
    scored = score_pairs(pairs, cfg, include_jaro_winkler=False)
    gammas = comparison_vectors(scored, cfg)
    if params is None:
        # EM reads the tiny pattern aggregate; the gamma lineage then
        # re-runs once for scoring — localCheckpoint would trade memory
        # for that second pass at very large pair sets
        params = fs_em_fit(gammas)
    probd = fs_score(gammas, params).withColumn(
        "score", F.col("match_prob")
    )
    out = mutual_best_matches(probd, cfg, threshold=min_match_prob)
    return out.select("conv_id_a", "conv_id_b", "match_weight", "match_prob")
