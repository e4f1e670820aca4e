"""Pairwise precision / recall / F1 against labeled pairs.

Target (BASELINE.json): pairwise F1 >= 0.99 on labeled transcript pairs at
the shared blocking key. A labeled pair (a, b, is_match) is predicted
positive iff a and b received the same cluster_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pairwise_prf(labeled_pairs: DataFrame, clusters: DataFrame) -> dict:
    """Compute pairwise precision/recall/F1 of ``clusters(conv_id,
    cluster_id)`` over ``labeled_pairs(conv_id_a, conv_id_b, is_match)``.

    One broadcast-free join per side; the labeled set is small relative to
    the corpus, so the join keys prune the cluster table via dynamic filters.
    """
    ca = clusters.select(
        F.col("conv_id").alias("conv_id_a"), F.col("cluster_id").alias("_cl_a")
    )
    cb = clusters.select(
        F.col("conv_id").alias("conv_id_b"), F.col("cluster_id").alias("_cl_b")
    )
    judged = (
        labeled_pairs
        .join(ca, "conv_id_a", "left")
        .join(cb, "conv_id_b", "left")
        .withColumn(
            "predicted",
            (F.col("_cl_a").isNotNull())
            & (F.col("_cl_b").isNotNull())
            & (F.col("_cl_a") == F.col("_cl_b")),
        )
    )
    agg = judged.select(
        F.sum(F.when(F.col("predicted") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("predicted") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("predicted") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("predicted") & ~F.col("is_match"), 1).otherwise(0)).alias("tn"),
    ).first()
    tp, fp, fn, tn = (agg[k] or 0 for k in ("tp", "fp", "fn", "tn"))
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall) if precision + recall else 0.0
    )
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
    }


def blocking_quality_frame(
    candidates: DataFrame,
    true_pairs: DataFrame,
    a_col: str = "conv_id_a",
    b_col: str = "conv_id_b",
) -> DataFrame:
    """One-row blocking-quality metrics — the standard evaluation of a
    blocking scheme from the record-linkage literature (Christen 2012,
    "Data Matching", ch. 7): **pairs completeness** (share of true matched
    pairs the blocking retains — blocking recall; every pair lost here is
    unrecoverable by any downstream scorer) and **pairs quality** (share of
    candidate pairs that are true matches — how much comparison work the
    blocking wastes).

    Distributed shape: both inputs reduce to normalized (lo, hi) id pairs,
    ONE full-outer sort-merge join on the pair key, one global aggregate.
    No cross join, no driver collect — candidate volume never rides more
    than its own one exchange, so the evaluation costs no more than a
    count over the candidate set at any corpus size.
    """
    c = (
        candidates.select(
            F.least(a_col, b_col).alias("lo"),
            F.greatest(a_col, b_col).alias("hi"),
        )
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    t = (
        true_pairs.select(
            F.least(a_col, b_col).alias("lo"),
            F.greatest(a_col, b_col).alias("hi"),
        )
        .distinct()
        .withColumn("_t", F.lit(1))
    )
    u = c.join(t, ["lo", "hi"], "full_outer")
    # coalesce: an EMPTY candidate (or truth) side must read 0, not NULL —
    # sum over an all-NULL indicator column is NULL in Spark while the
    # CASE-WHEN counting idiom of the SQL twins yields 0
    agg = u.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("bigint").alias("n_candidates"),
        F.coalesce(F.sum("_t"), F.lit(0)).cast("bigint").alias("n_true"),
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_t").isNotNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_true_covered"),
    )
    # try_divide: an empty side's ratio is NULL (0/0) in both engines —
    # plain `/` raises DIVIDE_BY_ZERO under ANSI once the counts coalesce
    # to 0 instead of NULL
    return agg.select(
        "n_candidates", "n_true", "n_true_covered",
        F.try_divide(F.col("n_true_covered"), F.col("n_true"))
        .cast("double").alias("pairs_completeness"),
        F.try_divide(F.col("n_true_covered"), F.col("n_candidates"))
        .cast("double").alias("pairs_quality"),
    )


def blocking_quality(
    candidates: DataFrame,
    true_pairs: DataFrame,
    n_records: int | None = None,
    a_col: str = "conv_id_a",
    b_col: str = "conv_id_b",
) -> dict:
    """Dict form of :func:`blocking_quality_frame`, optionally adding the
    **reduction ratio** ``1 - n_candidates / (n_records choose 2)`` — the
    share of the all-pairs comparison space the blocking eliminated —
    when the caller supplies the record count."""
    row = blocking_quality_frame(candidates, true_pairs, a_col, b_col).first()
    out = row.asDict()
    if n_records is not None and n_records >= 2:
        total = n_records * (n_records - 1) / 2.0
        out["reduction_ratio"] = 1.0 - (out["n_candidates"] or 0) / total
    return out


def bcubed_cells_frame(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "conv_id",
    pred_col: str = "cluster_id",
    truth_col: str = "true_id",
) -> DataFrame:
    """The exact integer sufficient statistics of B-cubed evaluation
    (Bagga & Baldwin 1998; the standard cluster-level ER metric
    complementing pairwise F1): one row per distinct
    ``(cluster_size, truth_size, cell_size)`` triple with its cell count,
    where a *cell* is a (predicted cluster, true cluster) intersection.

    B³ precision is the per-record average of ``|C(e) ∩ T(e)| / |C(e)|``
    and recall the same over ``|T(e)|`` — grouping records by their cell
    turns both into sums over cells:
    ``P = Σ s²/cs / N``, ``R = Σ s²/ts / N`` with ``s`` the cell size,
    ``cs``/``ts`` the containing cluster/truth sizes, ``N = Σ s``.

    Distributed shape: one inner join on the id, three groupBy aggregates
    (cells, cluster sizes, truth sizes), two foreign-key joins of cells to
    sizes, one final histogram aggregate — no window over the corpus, no
    pair materialization, nothing driver-side. Every output column is an
    exact integer: the float arithmetic (whose accumulation order differs
    across engines/partitionings) is deliberately left to
    :func:`bcubed_prf`, so this frame is engine-comparable bit-for-bit.

    Records missing from either side are excluded by the inner join —
    B³ is defined over the commonly-labeled population.
    """
    assigned = (
        pred.select(F.col(id_col).alias("_id"), F.col(pred_col).alias("_c"))
        .join(
            truth.select(
                F.col(id_col).alias("_id"), F.col(truth_col).alias("_t")
            ),
            "_id",
        )
    )
    cells = assigned.groupBy("_c", "_t").agg(F.count("*").alias("cell_size"))
    csize = assigned.groupBy("_c").agg(F.count("*").alias("cluster_size"))
    tsize = assigned.groupBy("_t").agg(F.count("*").alias("truth_size"))
    return (
        cells.join(csize, "_c").join(tsize, "_t")
        .groupBy("cluster_size", "truth_size", "cell_size")
        .agg(F.count("*").alias("n_cells"))
    )


def bcubed_prf(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str = "conv_id",
    pred_col: str = "cluster_id",
    truth_col: str = "true_id",
) -> dict:
    """B-cubed precision / recall / F1 from the exact cell histogram.

    The histogram is bounded by the distinct (cluster_size, truth_size,
    cell_size) triples — collecting it is the same bounded-driver-side
    discipline as ``fs_pattern_counts`` (sizes repeat massively in real
    corpora; the triple space does not grow with corpus size the way rows
    do). Accumulation runs in sorted order so the floats are
    reproducible across partitionings.
    """
    rows = bcubed_cells_frame(
        pred, truth, id_col, pred_col, truth_col
    ).collect()
    hist = sorted(
        (int(r["cluster_size"]), int(r["truth_size"]), int(r["cell_size"]),
         int(r["n_cells"]))
        for r in rows
    )
    n = sum(s * k for _, _, s, k in hist)
    if n == 0:
        return {"n_records": 0, "precision": 1.0, "recall": 1.0, "f1": 1.0}
    p = sum(k * s * s / cs for cs, _, s, k in hist) / n
    r = sum(k * s * s / ts for _, ts, s, k in hist) / n
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"n_records": n, "precision": p, "recall": r, "f1": f1}


def cluster_graph_stats(
    clusters: DataFrame,
    sim_edges: DataFrame,
    exact_star_edges: DataFrame,
) -> DataFrame:
    """Per-cluster evidence-graph diagnostics (the over-merge audit).

    For every multi-member cluster: how much evidence holds it together,
    and of which kind. ``n_sim_edges`` / ``min_edge_score`` read on the
    similarity lane (a big cluster whose minimum edge score hugs the
    threshold is a chaining suspect); ``n_exact_edges`` counts the
    exact-digest star edges (a cluster with similarity edges absent is
    held together by byte-identical evidence only); ``sim_density`` is
    ``2·n_sim_edges / (n·(n-1))`` — near 1 means every member pair was
    independently scored as similar (clique-like, safe), near 0 on a
    large cluster means a thin chain (review candidate). This is the
    cluster-quality practice of public linkage engines (Splink's cluster
    metrics: node degree, density) expressed over the engine's two edge
    lanes.

    Inputs: ``clusters (conv_id, cluster_id)`` covering every record;
    ``sim_edges (src, dst, score)`` — thresholded scored pairs;
    ``exact_star_edges (src, dst)`` — the linear exact-digest stars
    (``clustering.exact_edges``). Every edge is intra-cluster by CC
    construction, so ONE endpoint join labels it.

    Scale shape: two key joins sized by the sparse edge sets + three
    aggregates, all on ``cluster_id`` — no pair re-generation, nothing
    quadratic; MIN/COUNT only (no order-dependent float SUM), and the
    density is one IEEE division of exact integers, so every column is
    reproducible in ANSI SQL bit-for-bit.
    """
    lab = clusters.select(
        F.col("conv_id").alias("src"), F.col("cluster_id")
    )
    per_sim = (
        sim_edges.select("src", "score")
        .join(lab, "src")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_sim_edges"),
            F.min("score").alias("min_edge_score"),
        )
    )
    per_exact = (
        exact_star_edges.select("src")
        .join(lab, "src")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_exact_edges"))
    )
    sizes = (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    return (
        sizes.join(per_sim, "cluster_id", "left")
        .join(per_exact, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_sim_edges", F.lit(0).cast("long"))
            .alias("n_sim_edges"),
            F.coalesce("n_exact_edges", F.lit(0).cast("long"))
            .alias("n_exact_edges"),
            "min_edge_score",
            (
                (F.coalesce("n_sim_edges", F.lit(0)) * F.lit(2))
                .cast("double")
                / (F.col("n_members") * (F.col("n_members") - F.lit(1)))
            ).alias("sim_density"),
        )
    )


def cluster_stability(
    base_clusters: DataFrame, strict_clusters: DataFrame
) -> DataFrame:
    """Threshold-sensitivity of every cluster (the split report).

    Re-clustering the SAME edge evidence at a stricter threshold and
    counting, per base cluster, how many strict sub-clusters its members
    fall into is the standard distance-threshold sensitivity diagnostic:
    a base cluster with ``n_sub = 1`` survives the stricter standard
    intact (its evidence is uniformly strong); ``n_sub > 1`` marks a
    cluster glued by near-threshold edges — the over-merge review queue,
    ranked by ``n_sub``.

    Inputs are two full assignments over the same ids (``conv_id,
    cluster_id``). One key join + one aggregate; ``count(distinct)`` is
    exact and order-free. Multi-member base clusters only.
    """
    strict = strict_clusters.select(
        "conv_id", F.col("cluster_id").alias("strict_cluster_id")
    )
    return (
        base_clusters.join(strict, "conv_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.countDistinct("strict_cluster_id").alias("n_sub"),
        )
        .filter(F.col("n_members") >= 2)
        .select(
            "cluster_id", "n_members", "n_sub",
            (F.col("n_sub") > 1).alias("splits"),
        )
    )


def threshold_sweep(
    scored: DataFrame,
    truth_pairs: DataFrame,
    thresholds: list[float],
) -> DataFrame:
    """Edge-level precision/recall/F1 at each candidate threshold.

    The calibration sweep behind choosing ``cfg.threshold``: against a
    labeled true-pair set, every grid value reports how the thresholded
    edge set would perform BEFORE clustering (edge-level, not pairwise-
    cluster-level — transitive closure can only merge, so edge precision
    upper-bounds cluster pairwise precision while edge recall lower-bounds
    it). True pairs the scorer never saw (blocking misses) count as false
    negatives at every threshold — the sweep inherits the blocking
    ceiling, which is what makes it an honest tuning curve.

    Scale shape: pairs normalized to ``(lo, hi)`` keys, ONE full-outer
    sort-merge join against the truth set (same discipline as
    ``blocking_quality_frame``), then the sparse union fans out by the
    literal grid (``|pairs| × |grid|`` tiny rows, grid ≤ ~20) into one
    aggregate. No per-threshold pass over the corpus, no collect. P/R/F1
    are single IEEE divisions of exact integer counts, so every column is
    ANSI-reproducible bit-for-bit; zero denominators yield NULL (never an
    ANSI-mode divide error).
    """
    s = (
        scored.select(
            F.least("conv_id_a", "conv_id_b").alias("lo"),
            F.greatest("conv_id_a", "conv_id_b").alias("hi"),
            "score",
        )
        .groupBy("lo", "hi")
        .agg(F.max("score").alias("score"))
    )
    t = (
        truth_pairs.select(
            F.least("conv_id_a", "conv_id_b").alias("lo"),
            F.greatest("conv_id_a", "conv_id_b").alias("hi"),
        )
        .distinct()
        .withColumn("is_true", F.lit(True))
    )
    u = s.join(t, ["lo", "hi"], "full_outer").select(
        "score", F.coalesce("is_true", F.lit(False)).alias("is_true")
    )
    grid = F.array(*[F.lit(float(x)) for x in thresholds])
    e = u.select(
        "score", "is_true", F.explode(grid).alias("threshold")
    )
    hit = F.col("score").isNotNull() & (F.col("score") >= F.col("threshold"))
    agg = e.groupBy("threshold").agg(
        F.sum(F.when(F.col("is_true") & hit, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_true") & hit, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_true") & ~hit, 1).otherwise(0)).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    div = lambda num, den: F.when(  # noqa: E731 — NULL on 0, never ANSI error
        den == 0, F.lit(None).cast("double")
    ).otherwise(num.cast("double") / den)
    return agg.select(
        "threshold", "tp", "fp", "fn",
        div(tp, tp + fp).alias("precision"),
        div(tp, tp + fn).alias("recall"),
        div(tp * 2, tp * 2 + fp + fn).alias("f1"),
    )


def cluster_glue_edges(
    base_clusters: DataFrame,
    strict_clusters: DataFrame,
    sim_edges: DataFrame,
) -> DataFrame:
    """The specific edges that glue strict sub-clusters together — the
    over-merge culprits ``cluster_stability`` counts.

    An edge whose endpoints fall in DIFFERENT strict sub-clusters is the
    evidence that merged them at the base threshold: remove it (raise the
    threshold past its score) and the base cluster splits along exactly
    this seam. The report gives a reviewer the actual suspect pair —
    cluster id, both endpoints, the edge score — ranked naturally by
    score ascending (the weakest glue first). Complements
    ``cluster_stability`` (how many pieces) and ``cluster_graph_stats``
    (how dense) by naming WHICH evidence to re-examine.

    Inputs: two full assignments (``conv_id, cluster_id``) over the same
    ids and the similarity edge list ``(src, dst, score)``. Two key joins
    against the strict labels + one against the base labels — all sized
    by the sparse edge set, nothing quadratic, no window.
    """
    s_src = strict_clusters.select(
        F.col("conv_id").alias("src"), F.col("cluster_id").alias("_s_src")
    )
    s_dst = strict_clusters.select(
        F.col("conv_id").alias("dst"), F.col("cluster_id").alias("_s_dst")
    )
    base = base_clusters.select(
        F.col("conv_id").alias("src"), "cluster_id"
    )
    return (
        sim_edges.join(s_src, "src")
        .join(s_dst, "dst")
        .filter(F.col("_s_src") != F.col("_s_dst"))
        .join(base, "src")
        .select("cluster_id", "src", "dst", "score")
    )
