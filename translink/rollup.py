"""Multi-dimensional aggregation — pivot matrices and rollup hierarchies
over corpus dimension columns (the dataset-mix accounting a curation
report is built from).

Scale notes baked into the API:

- ``doc_lang_source_matrix`` REQUIRES a pinned pivot-value list. Spark's
  ``pivot(col)`` without values runs a driver-side distinct collect over
  the corpus to discover them — fine at fixture scale, a full extra job
  at 100 TB, and it makes the output schema data-dependent. Pinning the
  list keeps the plan a single hash aggregation and the schema stable;
  everything outside the list lands in ``other`` so no row is dropped.
- ``doc_source_lang_rollup`` uses native ``ROLLUP`` — Spark expands
  grouping sets inside one aggregation (partial combine still applies),
  so the hierarchy costs one exchange, not one job per level.

Reference analog: the reference's scan statistics aggregate one global
level (``src/pipeline/stats.rs``); these generalize that rollup to
dimension hierarchies.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: Default pinned language lanes (the fixture's set); anything else -> other.
DEFAULT_LANGS = ("de", "en", "es", "fr", "zh")


def doc_lang_source_matrix(
    docs: DataFrame, langs: Sequence[str] = DEFAULT_LANGS
) -> DataFrame:
    """Source x language count matrix: one row per source, one pinned
    column per language plus an ``other`` catch-all. Missing combinations
    are 0, never null, so the matrix is dense and schema-stable."""
    langs = list(langs)
    lane = F.when(F.col("lang").isin(langs), F.col("lang")).otherwise(
        F.lit("other")
    )
    out = (
        docs.select("source", lane.alias("_lane"))
        .groupBy("source")
        .pivot("_lane", langs + ["other"])
        .count()
    )
    return out.select(
        "source",
        *[F.coalesce(c, F.lit(0)).cast("long").alias(c) for c in langs + ["other"]],
    )


def doc_source_lang_rollup(docs: DataFrame) -> DataFrame:
    """ROLLUP hierarchy: (source, lang) -> per-source subtotal -> grand
    total, with ``grouping_id`` distinguishing levels (0 = leaf, 1 = per
    source, 3 = grand total; rolled-up dimensions are null)."""
    return (
        docs.rollup("source", "lang")
        .agg(
            F.grouping_id().cast("long").alias("level"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select("source", "lang", "level", "n_docs", "total_chars")
    )
