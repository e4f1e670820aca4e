"""Deterministic corpus sampling — the subset-selection pass of a
training-data pipeline (per-source mixes, held-out carve-outs, debug
slices) made reproducible across engines and runs.

``df.sample()`` is seed-dependent on partitioning and not reproducible
across engines; these operators key acceptance off a cryptographic hash
of the row's stable id instead, so the SAME rows are selected by Spark,
by the DuckDB oracle, and by any re-run over a repartitioned copy.

- ``doc_sample_frac``: zero-shuffle Bernoulli-style sampling. The plan is
  Filter over the scan — no exchange at all, so it costs one map pass at
  any corpus size and composes with partition pruning.
- ``doc_sample_stratified``: exact per-source quota (top-K by hash rank).
  This one pays a per-source sort window; source cardinality is small by
  construction (it is a dataset-mix label), so partitions are fat but
  bounded — at extreme per-source row counts switch to the frac sampler
  with a per-source threshold instead (same hash key, no sort).

Reference analog: the reference samples file content at fixed offsets for
its quick-check tier (``src/pipeline/quick_check.rs``) — a deterministic,
content-keyed subset decision; these generalize that idea to row
selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Hash-acceptance key: first 4 hex chars of md5("<seed>:<doc_id>") give a
#: uniform 16-bit lane; comparing against a hex threshold selects
#: floor(frac * 65536) / 65536 of rows in expectation, identically in any
#: engine with md5.
def _accept_key(seed: str) -> F.Column:
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))), 1, 4
    )


def doc_sample_frac(
    docs: DataFrame, threshold_hex: str = "2000", seed: str = "s0"
) -> DataFrame:
    """Keep rows whose 16-bit hash lane < ``threshold_hex`` (default
    0x2000/0x10000 = 12.5%). Zero shuffle: the plan is a single Filter
    pushed onto the scan projection."""
    threshold_hex = threshold_hex.lower()
    if len(threshold_hex) != 4 or any(c not in "0123456789abcdef" for c in threshold_hex):
        # the comparison is lexicographic against 4 lowercase hex chars:
        # an uppercase or mis-sized threshold silently selects the wrong
        # fraction ('A800' < 'a' for every digit-leading key)
        raise ValueError(f"threshold_hex must be 4 lowercase hex chars, got {threshold_hex!r}")
    return docs.select(
        "doc_id", "lang", "source", "n_chars", _accept_key(seed).alias("sample_key")
    ).filter(F.col("sample_key") < threshold_hex)


def doc_sample_stratified(
    docs: DataFrame, per_source: int = 40, seed: str = "s0"
) -> DataFrame:
    """Exactly ``per_source`` rows per source (fewer if the source is
    smaller), chosen by hash rank — a reproducible stratified quota.
    ``doc_id`` breaks (astronomically unlikely) hash-rank ties so the
    selection is total-ordered in every engine."""
    w = Window.partitionBy("source").orderBy(_accept_key(seed).asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", "n_chars", _accept_key(seed).alias("sample_key"))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= per_source)
        .select("doc_id", "source", "n_chars", "sample_rank")
    )
