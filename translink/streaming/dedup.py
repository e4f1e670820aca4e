"""Streaming exact deduplication with bounded state.

The reference's core operation — drop byte-identical records — in its
streaming form: duplicates arriving within the watermark horizon are
dropped exactly once, and the dedup state is EVICTED as event time
advances, so state size tracks the horizon's traffic, not the stream's
lifetime (the unbounded-state failure every naive streaming dedup hits).
Spark-native: ``dropDuplicatesWithinWatermark`` (state-store backed), no
custom state, no Python in the hot path.

Reference analog: the streaming hash stage that groups identical digests
as they arrive (``src/pipeline/streaming_hash.rs:132-202``); its "flush on
horizon" is the watermark here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def digest_expr(cols: list[str]):
    """Portable record digest over the listed columns: md5 of a
    LENGTH-PREFIXED, null-tagged concat. Length prefixes make the field
    framing injection-proof — a bare separator is forgeable by data that
    contains the separator character (('a\\x1fb','c') vs ('a','b\\x1fc')
    would collide), whereas '<len>:<value>' framing is uniquely decodable
    for any byte content. Null encodes as 'n' (no length prefix, so it
    cannot collide with any real value, including the literal string a
    null tag would otherwise share). Single hash family here because the
    op is a bounded-horizon dedup, not a merge — same caveat as
    translink/signatures.py."""
    tagged = [
        F.when(F.col(c).isNull(), F.lit("n")).otherwise(
            F.concat(
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            )
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *tagged))


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the FIRST arrival of every ``key_cols`` value within the
    watermark horizon; re-deliveries inside the horizon are dropped, state
    for expired horizons is evicted. A duplicate arriving later than the
    horizon is emitted again — the documented bounded-state contract
    (exactly what a dedup-at-ingest stage wants: the batch-side exact
    dedup downstream owns cross-horizon duplicates)."""
    return (
        stream.withColumn("_digest", digest_expr(key_cols))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )
