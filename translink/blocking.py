"""Stage 2 — blocking keys, with explicit skew-bounding salt.

The reference's core "join" is repeated hash-and-group on progressively
stronger keys (size -> sampled checksum -> SimHash -> full hash; reference
``src/pipeline/metadata.rs:43-49``, ``src/pipeline/streaming_hash.rs:132-202``).
That is textbook entity-resolution *blocking*. We emit two families of keys:

  - cheap attribute key: ``(n_turns, total_chars // length_bucket)`` — the
    analog of group-by-size (A1).
  - LSH band keys: the MinHash signature split into ``b`` bands of ``r``
    rows; each band hashed to one key (A4 analog, proper MinHash-LSH instead
    of exact-SimHash grouping).

Skew (P8): one hot key (e.g. thousands of empty conversations) makes the
downstream self-join quadratic. We bound every block to ``max_block_size``
candidates by appending a salt. Pairs across salt sub-blocks of an
oversized block are sacrificed — a deliberate guardrail, the analog of the
reference's bounded sampling (P5) and bounded channels (T4) — and the
overflow is observable in metrics (blocks_oversized). WHICH pairs are
sacrificed is the recall lever: the default ``rank`` mode sorts each block
by a caller-supplied similarity-correlated key (record length, then id)
and cuts it into contiguous ``max_block_size`` chunks — the sorted-
neighborhood principle (Hernandez & Stolfo 1995): records likely to match
sort adjacently, so the sacrificed cross-chunk pairs are preferentially
the UNLIKELY ones. A modulo or hash assignment has the same size bound but
scatters sorted neighbors across sub-blocks, losing true pairs at
(1 - 1/n_salt) — measured as pairs-completeness 0.245 vs 0.98+ for
chunking on the planted-twin corpus (translink.evaluate.blocking_quality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from translink.config import LinkConfig


def with_block_key(signed: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Add the cheap attribute blocking key ``block_key: string``.

    ``n_turns`` and a bucketed ``total_chars`` — both O(1) per record and
    computed map-side; near-duplicates with small text perturbations land in
    the same bucket when the edit stays within ``length_bucket`` chars.
    """
    cfg = cfg or LinkConfig()
    return signed.withColumn(
        "block_key",
        F.concat_ws(
            "|",
            F.col("n_turns").cast("string"),
            F.floor(F.col("total_chars") / cfg.length_bucket).cast("string"),
        ),
    )


def with_salt(
    df: DataFrame,
    key_cols: list[str],
    cfg: LinkConfig | None = None,
    id_col: str = "conv_id",
    order_cols: list | None = None,
) -> DataFrame:
    """Append ``salt: int`` bounding each ``key_cols`` block to
    ``cfg.max_block_size`` members, plus ``block_size`` for metrics.

    Two deterministic modes (cfg.salt_mode):
      - ``rank`` (sorted-neighborhood chunking): rows of a block are sorted
        by ``order_cols`` (default ``[id_col]``; callers pass a
        similarity-correlated prefix like record length) and assigned
        ``salt = (rank - 1) // max_block_size`` — contiguous chunks, so
        sorted neighbors stay in the same sub-block and the sacrificed
        cross-chunk pairs are the sort-distant (unlikely-match) ones.
        Exactly reproducible in ANSI SQL engines — used by the DuckDB
        oracle. ``order_cols`` together with ``id_col`` as the final
        tiebreak must be a total order for determinism; ``id_col`` is
        appended automatically when not already last.
      - ``hash``: salt = pmod(xxhash64(id), n_salt),
        ``n_salt = ceil(block_size / max_block_size)``. Stateless per row
        once block_size is known; stable under input reordering, but
        scatters neighbors — lower pair recall in oversized blocks.

    Both need one window over the block key (a single shuffle that the
    downstream self-join reuses, since the join key is a superset).
    """
    cfg = cfg or LinkConfig()
    w = Window.partitionBy(*key_cols)
    df = df.withColumn("block_size", F.count("*").over(w))
    if cfg.salt_mode == "rank":
        order = list(order_cols or [])
        if not order or (isinstance(order[-1], str) and order[-1] != id_col):
            order.append(id_col)
        rn = F.row_number().over(w.orderBy(*order))
        salt = F.floor((rn - F.lit(1)) / cfg.max_block_size).cast("int")
    else:
        n_salt = F.ceil(F.col("block_size") / cfg.max_block_size).cast("int")
        salt = F.pmod(F.xxhash64(F.col(id_col)), n_salt).cast("int")
    return df.withColumn("salt", salt)


def band_hashes_expr(
    b: int, r: int, minhash_col: str = "minhash"
) -> F.Column:
    """``array<bigint>`` of the ``b`` band hashes of a MinHash signature.

    Each band hash is one ``xxhash64`` call over that band's ``r`` signature
    components plus the band index — a flat, whole-stage-codegen expression.
    (The lambda formulation ``transform(sequence(b), i -> xxhash64(
    array_join(slice(...))))`` runs interpreted and allocates a string per
    band per row — measured as the dominant cost of the pairs stage at bench
    scale; see PLANS.md interpreted-expression findings.)
    """
    return F.array(*[
        F.xxhash64(
            *[F.element_at(minhash_col, i * r + j + 1) for j in range(r)],
            F.lit(i),
        )
        for i in range(b)
    ])


def lsh_band_keys(signed: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Explode the MinHash signature into ``(band_id, band_hash)`` blocking
    keys — one output row per (conversation, band).

    Two conversations share a band key iff their signatures agree on all
    ``r = num_hashes/bands`` components of that band; P[share >= 1 band]
    follows the standard (1 - (1 - j^r)^b) S-curve, so bands/rows tune the
    Jaccard threshold the blocker recalls.
    """
    cfg = cfg or LinkConfig()
    b, r = cfg.lsh_bands, cfg.lsh_rows
    return (
        signed
        .select(
            "conv_id",
            F.posexplode(band_hashes_expr(b, r)).alias("band_id", "band_hash"),
        )
    )


def volume_forecast(
    keys: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    lane: str,
) -> DataFrame:
    """One-row candidate-volume forecast for a blocking lane: the EXACT
    number of self-join pairs the lane will generate, computed from block
    sizes alone — sum over blocks of C(size, 2) — without materializing a
    single pair.

    This is the pre-flight budget check for a large run: a forecast is one
    groupBy over the key table (O(records) work), while the join it
    predicts is O(sum size^2). Compare lanes, catch a mis-tuned
    `length_bucket`/purge bound, or project shuffle volume (pairs x
    payload bytes) BEFORE paying for it. All counts are exact int64
    arithmetic, reproducible in any ANSI engine.

    Output: ``(lane, n_rows, n_blocks, max_block_size, join_pairs)`` where
    ``n_rows`` counts key-table rows, ``n_blocks`` distinct keys, and
    ``join_pairs = sum C(size, 2)`` the lane's exact unordered pair
    fan-out (counting a pair once per shared block it appears in — the
    join's true row count before any pair-level dedup).
    """
    sizes = keys.groupBy(*key_cols).agg(F.count("*").alias("_bs"))
    agg = sizes.agg(
        F.coalesce(F.sum("_bs"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_blocks"),
        F.coalesce(F.max("_bs"), F.lit(0)).cast("bigint")
        .alias("max_block_size"),
        # each C(n,2) term is integer-valued (n(n-1) is even), so the
        # double halves and their sum are exact up to 2^53 in any order
        F.coalesce(
            F.sum(F.col("_bs") * (F.col("_bs") - 1) / 2), F.lit(0)
        ).cast("bigint").alias("join_pairs"),
    )
    return agg.select(F.lit(lane).alias("lane"), "*")


def bipartite_volume_forecast(
    keys: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    lane: str,
    side_col: str = "_side",
) -> DataFrame:
    """One-row forecast of a BIPARTITE lane's A×B join fan-out from block
    sizes alone: sum over blocks of ``n_a * n_b`` — only cross-side pairs
    count (the linkage join's ``side_a < side_b`` predicate), so the
    self-join formula C(n, 2) would overstate it by the within-side terms.
    Same output schema as :func:`volume_forecast`.
    """
    sizes = keys.groupBy(*key_cols).agg(
        F.sum(F.when(F.col(side_col) == "a", 1).otherwise(0)).alias("_na"),
        F.sum(F.when(F.col(side_col) == "b", 1).otherwise(0)).alias("_nb"),
    )
    agg = sizes.agg(
        F.coalesce(F.sum(F.col("_na") + F.col("_nb")), F.lit(0))
        .cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_blocks"),
        F.coalesce(F.max(F.col("_na") + F.col("_nb")), F.lit(0))
        .cast("bigint").alias("max_block_size"),
        F.coalesce(F.sum(F.col("_na") * F.col("_nb")), F.lit(0))
        .cast("bigint").alias("join_pairs"),
    )
    return agg.select(F.lit(lane).alias("lane"), "*")


class PairBudgetExceeded(RuntimeError):
    """A blocking lane's forecast candidate fan-out exceeds the configured
    ``cfg.pair_budget`` — raised BEFORE the self-join that would generate
    the pairs runs (the reference's bounded-channel backpressure,
    ``src/main.rs:141-146``, applied to shuffle volume instead of channel
    depth). Carries the offending forecasts for programmatic handling."""

    def __init__(self, over: list[dict], budget: int):
        self.over = over
        self.budget = budget
        lanes = "; ".join(
            f"{d['lane']}: {d['join_pairs']:,} pairs "
            f"(max block {d['max_block_size']})"
            for d in over
        )
        super().__init__(
            f"pair budget {budget:,} exceeded before pair generation — "
            f"{lanes}. Lower max_block_size / meta_purge_size, raise the "
            f"lane's selectivity (length_bucket, lsh_bands), or raise "
            f"pair_budget."
        )


def enforce_pair_budget(
    forecasts: list[DataFrame], budget: int
) -> list[dict]:
    """Run the pre-flight: union the one-row lane forecasts, collect them
    (bounded: one row per lane), and raise :class:`PairBudgetExceeded` if
    any lane's exact ``join_pairs`` fan-out exceeds ``budget``.

    Returns the forecast rows (as dicts) so callers can log them. The
    collect is O(lanes) rows from O(records) aggregations — the whole point
    is paying this before the O(pairs) join.
    """
    df = forecasts[0]
    for f in forecasts[1:]:
        df = df.unionByName(f)
    rows = [r.asDict() for r in df.collect()]
    over = [r for r in rows if r["join_pairs"] > budget]
    if over:
        raise PairBudgetExceeded(over, budget)
    return rows


def oversized_blocks(
    df_with_salt: DataFrame,
    cfg: LinkConfig | None = None,
    key_cols: list[str] | tuple[str, ...] = ("block_key",),
) -> DataFrame:
    """Blocks whose size exceeded the salt bound — the observable overflow
    metric (P8): each row is one block that was split, with its fan-out.

    ``key_cols`` must name the same keys the ``with_salt`` call used, so the
    metric works for any salted table — attribute blocks (the default) or
    LSH band blocks (``["band_id", "band_hash"]``), where bucket overflow
    (e.g. a hot near-constant signature) is the likelier skew source.
    ``n_salt`` is recomputed from ``block_size`` with ``with_salt``'s own
    formula: ``max(salt) + 1`` understates the fan-out in ``hash`` salt
    mode, where ``pmod(xxhash64(id), n_salt)`` need not attain every value.
    """
    cfg = cfg or LinkConfig()
    return (
        df_with_salt
        .filter(F.col("block_size") > cfg.max_block_size)
        .groupBy(*key_cols)
        .agg(F.max("block_size").alias("block_size"))
        .withColumn(
            "n_salt",
            F.ceil(F.col("block_size") / cfg.max_block_size).cast("int"),
        )
    )
