"""Semi-structured (JSON) column extraction — typed, codegen'd, UDF-free.

Event/interaction logs carry a free-form JSON properties column
(``events.props`` in the test corpus); large-scale pipelines need typed
access to it without a Python parse per row. ``from_json`` runs Jackson
inside whole-stage codegen; PERMISSIVE mode turns malformed documents into
nulls instead of failing the stage (the same verdict-not-crash discipline as
the engine's other classifiers). Reference analog: the metadata-enrichment
projection F7 (``src/pipeline/quick_check.rs``) — derive typed columns from
an opaque payload, keep the row either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructType


def parse_json_col(
    df: DataFrame,
    schema: str,
    json_col: str = "props",
    prefix: str = "",
) -> DataFrame:
    """Project typed fields out of a JSON string column.

    ``schema`` is a DDL string (``"k BIGINT, tag STRING"``); every field
    becomes a top-level column (optionally ``prefix``-ed), appended to the
    existing columns. Malformed or missing fields are null."""
    parsed: Column = F.from_json(F.col(json_col), schema)
    names = [f.name for f in StructType.fromDDL(schema).fields]
    clashes = {f"{prefix}{n}" for n in names} & set(df.columns)
    if clashes:
        # fail at plan-build time with the cause: a duplicate column name
        # surfaces later as AMBIGUOUS_REFERENCE on the first use
        raise ValueError(
            f"extracted column(s) {sorted(clashes)} collide with existing "
            f"columns; pass a prefix"
        )
    return df.select(
        *df.columns,
        *[parsed.getField(n).alias(f"{prefix}{n}") for n in names],
    )
