"""Streaming record linkage — new records matched on arrival.

The batch linkage (``translink.linkage``) answers "which B record is the
same entity as this A record" over two complete corpora. The streaming
version answers it AS B ARRIVES: a static reference corpus A (the
warehouse, yesterday's deduplicated export) and a landing directory of
B-side transcript drops; every micro-batch links its new conversations
against A and appends the resolved matches. Reference analog: the
streaming walker feeding the grouping stages one batch at a time
(``src/pipeline/streaming_hash.rs:132-202``) — here feeding a two-corpus
matcher instead of a dedup grouper.

Assignment semantics (documented, not hidden): the batch engine's greedy
mutual-best becomes FIRST-COME-FIRST-SERVED across batches — an A record
assigned in an earlier batch is never re-assigned, and a B conversation
is decided exactly once, on its first delivery (both via anti-joins
against the match store, sized by matches so far). Within one batch the
resolution IS the batch operator (``mutual_best_matches``), so a corpus
delivered as a single drop produces exactly the batch result. The order
of drops can change WHICH of two competing matches wins — that is the
inherent price of deciding online; the alternative (deferring every
contested A) is the batch job, which this module does not replace.

Replay safety: each batch writes to its own ``batch_id=N`` partition with
dynamic overwrite, and the already-assigned anti-joins read only
partitions ``< N`` — a re-run of batch N (foreachBatch is at-least-once)
overwrites its own output instead of double-appending, and never sees its
own half-written matches as "taken".

Scale shape: the static side is prepped ONCE (canonicalize + block key +
shingles, persisted to the store as parquet, re-read per batch — no
driver-held state, no broadcast); per-batch cost is the batch's own
blocking + the sparse A-candidate join, and the anti-joins scan only the
match store (|matches|, not |A|).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from translink.config import LinkConfig
from translink.linkage import (
    link_candidate_pairs,
    mutual_best_matches,
    prep_corpus as _prep,
)
from translink.scoring import score_pairs
from translink.streaming.incremental import stream_transcript_dir

A_PREP = "link_a_prep"
MATCHES = "link_matches"


def prepare_reference(
    spark: SparkSession,
    a_turns: DataFrame,
    store_dir: str,
    cfg: LinkConfig | None = None,
) -> str:
    """Canonicalize + block + shingle the static A corpus once, persisted
    to ``store_dir`` so every micro-batch re-reads columnar parquet
    instead of re-running the A-side lineage. Returns the parquet path."""
    cfg = cfg or LinkConfig()
    os.makedirs(store_dir, exist_ok=True)
    path = os.path.join(store_dir, A_PREP)
    _prep(a_turns, cfg).write.mode("overwrite").parquet(path)
    return path


def incremental_link(
    spark: SparkSession,
    landing_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    cfg: LinkConfig | None = None,
    threshold: float | None = None,
    available_now: bool = True,
    model: str = "blend",
    fs_params=None,
    min_match_prob: float = 0.95,
):
    """Link a stream of B-side transcript drops against the prepared A.

    ``prepare_reference`` must have run against ``store_dir`` first.
    Drops must deliver whole conversations (the walker contract; for
    split/re-delivered conversations, assemble upstream with
    ``translink.streaming.assemble`` or the turn-store repair in
    ``translink.streaming.incremental``). Returns the StreamingQuery;
    with ``available_now`` it drains pending files then stops.

    ``model`` picks the scorer: ``"blend"`` ranks and thresholds on the
    similarity blend; ``"fs"`` on the Fellegi–Sunter match weight
    (``score`` in the match store then IS the weight), thresholded at
    the weight whose posterior equals ``min_match_prob``. FS parameters
    must be FIXED for a stream (``fs_params``, default ``FSParams()``,
    or pre-fit offline with ``fs_em_fit`` on a historical sample) — a
    per-batch EM re-fit would let the decision boundary drift between
    batches, making match decisions depend on arrival grouping.
    """
    if model not in ("blend", "fs"):
        raise ValueError(f"unknown link model: {model}")
    cfg = cfg or LinkConfig()
    a_path = os.path.join(store_dir, A_PREP)
    matches_path = os.path.join(store_dir, MATCHES)
    stream = stream_transcript_dir(spark, landing_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        a_prep = spark.read.parquet(a_path)
        b_prep = _prep(batch_df, cfg)
        prior = _read_matches_before(spark, matches_path, int(batch_id))
        if prior is not None:
            # first-come-first-served: taken A records and already-decided
            # B conversations never re-enter the assignment
            a_prep = a_prep.join(
                prior.select(F.col("conv_id_a").alias("conv_id")),
                "conv_id", "left_anti",
            )
            b_prep = b_prep.join(
                prior.select(F.col("conv_id_b").alias("conv_id")),
                "conv_id", "left_anti",
            )
        pairs = link_candidate_pairs(
            a_prep, b_prep, cfg,
            payload_cols=["canon_text", "shingles", "total_chars"],
        )
        scored = score_pairs(pairs, cfg, include_jaro_winkler=False)
        if model == "fs":
            from translink.fellegi_sunter import (
                FSParams, comparison_vectors, fs_weight_expr,
                fs_weight_threshold,
            )

            params = fs_params or FSParams()
            scored = comparison_vectors(scored, cfg).withColumn(
                "score", fs_weight_expr(params)
            )
            thr = fs_weight_threshold(min_match_prob, params)
        else:
            thr = threshold
        out = mutual_best_matches(scored, cfg, threshold=thr).select(
            "conv_id_a", "conv_id_b", "score",
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
        )
        (
            out.write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(matches_path)
        )

    writer = (
        stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_matches_before(
    spark: SparkSession, matches_path: str, batch_id: int
) -> DataFrame | None:
    """Matches from strictly earlier batches (replay safety), or None on
    the first batch (path not written yet)."""
    try:
        m = spark.read.parquet(matches_path)
    except Exception:
        return None
    return m.filter(F.col("batch_id") < F.lit(batch_id))


def read_match_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Every streamed match: (conv_id_a, conv_id_b, score, batch_id).
    One row per A and per B by construction (the per-batch anti-joins)."""
    return spark.read.parquet(os.path.join(store_dir, MATCHES))
