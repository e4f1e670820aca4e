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
