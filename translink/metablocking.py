"""Meta-blocking — redundancy-aware candidate pruning over a blocking graph.

The reference prunes its comparison space by re-grouping candidates on
progressively stronger keys (size -> sampled checksum -> full hash;
reference ``src/pipeline/metadata.rs:43-49``,
``src/pipeline/streaming_hash.rs:132-202``): records that keep co-occurring
as the key gets stronger are the ones worth a full comparison.
Meta-blocking (Papadakis, Koutrika, Palpanas & Nejdl, "Meta-Blocking:
Taking Entity Resolution to the Next Level", IEEE TKDE 2014) generalizes
that idea to ANY redundant blocking scheme: build the *blocking graph*
whose edges are record pairs sharing >= 1 block, WEIGHT each edge by its
co-occurrence evidence, and prune low-evidence edges *before* any
expensive pairwise scoring. Combined with token blocking and block purging
(Papadakis et al., JCDL 2011) it is the standard way to run a
high-redundancy blocking lane at corpus scale without a quadratic blow-up.

Pipeline shape (all stages bounded, broadcast-free, no driver loops):

1. **Token blocking** — every distinct lowercase word token of the (capped)
   canonical text is a blocking key: one ``(conv_id, key)`` row per token,
   O(tokens) rows total.
2. **Block purging** — keys whose block exceeds ``meta_purge_size`` are
   dropped wholesale: stop-word blocks cost O(size^2) pairs and carry
   near-zero evidence (everything co-occurs in "the"). Singleton blocks
   pair nothing and die too. After purging, per-key join fan-out is capped
   at ``meta_purge_size^2`` regardless of corpus size — purging IS the
   skew bound for this lane (the attribute/LSH lanes bound with salt
   instead because every one of their keys must survive).
3. **Edge weighting** — one self-join per surviving key, one map-side
   combined aggregation on the pair id: ``common_keys`` = number of shared
   blocks (CBS weight), and the Jaccard-normalized
   ``weight = common / (|keys_a| + |keys_b| - common)`` (JS weight) from a
   join against the tiny per-node key-count frame. The weight is a single
   IEEE division of exact int64s — bit-reproducible across engines.
4. **CNP pruning** (cardinality node pruning, node-centric with union
   semantics) — per node keep its top-``meta_top_k`` neighbors by
   ``(weight DESC, neighbor id ASC)``; an edge survives if EITHER endpoint
   retains it. Two window ranks over the sparse weighted edge set, then
   one semi-style join back — the surviving edge set is bounded by
   ``records * k``: linear in the corpus, however dense the graph was.

The surviving pairs feed the same scorer as every other lane
(``translink.scoring.score_pairs``); schema matches ``candidate_pairs``
minus payloads: ``(conv_id_a, conv_id_b, common_keys, weight)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from translink.config import LinkConfig
from translink.signatures import TOKENIZE_PATTERN


def token_block_keys(
    canonical: DataFrame,
    cfg: LinkConfig | None = None,
    text_col: str = "canon_text",
    id_col: str = "conv_id",
) -> DataFrame:
    """Token-blocking lane: one ``(conv_id, key)`` row per distinct
    lowercase word token of the first ``cfg.meta_text_cap`` chars of
    ``text_col``.

    The cap bounds per-record key fan-out (and the downstream graph
    degree) the same way ``lev_text_cap`` bounds the scorer: canonical
    text opens with the earliest turns, which carry the discriminating
    prefix for transcripts. Tokenization is the engine-shared
    ``TOKENIZE_PATTERN`` (translink/signatures.py) so the DuckDB oracle
    reproduces the key set exactly.
    """
    cfg = cfg or LinkConfig()
    capped = F.substring(F.col(text_col), 1, cfg.meta_text_cap)
    toks = F.array_remove(
        F.array_distinct(F.split(F.lower(capped), TOKENIZE_PATTERN)), ""
    )
    return canonical.select(
        F.col(id_col).alias("conv_id"),
        F.explode(toks).alias("key"),
    )


def shingle_block_keys(
    canonical: DataFrame,
    cfg: LinkConfig | None = None,
    text_col: str = "canon_text",
    id_col: str = "conv_id",
) -> DataFrame:
    """Shingle-blocking lane: one ``(conv_id, key)`` row per distinct word
    ``cfg.shingle_size``-gram of the capped canonical text.

    The discriminating alternative to :func:`token_block_keys` for corpora
    whose per-token document frequency explodes with scale: on a
    10^12-conversation corpus every single TOKEN is a stop-word (its block
    exceeds any purge bound and the whole token lane purges away), while
    word n-grams keep their selectivity — a shingle's block collects only
    records sharing a full n-word phrase. Same purge/weight/prune stack
    downstream; the weight becomes the records' shingle-set Jaccard, i.e.
    the inverted-index formulation of the exact Jaccard join (the
    prefix-filtering/AllPairs family, Bayardo et al., WWW 2007) with
    meta-blocking's evidence pruning on top.
    """
    cfg = cfg or LinkConfig()
    from translink.signatures import shingles_expr

    capped = canonical.withColumn(
        "_meta_text", F.substring(F.col(text_col), 1, cfg.meta_text_cap)
    )
    return capped.select(
        F.col(id_col).alias("conv_id"),
        F.explode(shingles_expr("_meta_text", cfg.shingle_size)).alias("key"),
    )


def purge_blocks(keys: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Block purging: drop keys whose block size exceeds
    ``cfg.meta_purge_size``.

    One window count over ``key`` — a single shuffle whose partitioning
    the downstream self-join on ``key`` reuses. Oversized (stop-word)
    blocks are removed wholesale rather than salted: unlike the
    attribute/LSH lanes, a token lane is *redundant* (every record holds
    many keys), so dropping a hot key loses a pair only if that key was
    its sole shared block — and a pair whose only evidence is a stop-word
    was noise, not signal (Papadakis et al. 2011 measure exactly this
    trade).

    Singleton blocks are deliberately KEPT: they pair nothing (the pair
    join skips them, :func:`meta_block_pairs`), but they are part of each
    record's block set ``B_i`` and must count in the JS weight's
    denominator ``|B_a| + |B_b| - |B_a ∩ B_b|``. Dropping them first
    silently conditions every node degree on "keys shared with someone",
    and in the extreme two records sharing ONLY boilerplate keys score a
    perfect 1.0 — caught by the linkage meta-model test, where two
    unrelated conversations matched on their shared 'turn N <role>'
    scaffolding alone.

    Run AFTER :func:`filter_blocks`, not before: the purge is the hard
    per-key fan-out guard over the post-filter block sizes. Purge-first
    would delete a long record's entire key set before filtering could
    choose among it; filter-first lets the record keep its r most
    selective keys and only then bounds what remains. (Neither order
    helps a saturated-vocabulary corpus with no selective keys at all —
    see :func:`filter_blocks` on detecting that regime and routing it to
    the MinHash-LSH lane.)
    """
    cfg = cfg or LinkConfig()
    bs = F.count("*").over(Window.partitionBy("key"))
    return (
        keys.withColumn("block_size", bs)
        .filter(F.col("block_size") <= cfg.meta_purge_size)
        .drop("block_size")
    )


def filter_blocks(
    keys: DataFrame,
    cfg: LinkConfig | None = None,
    id_cols: list[str] | tuple[str, ...] = ("conv_id",),
) -> DataFrame:
    """Block filtering (Papadakis, Papastefanatos, Palpanas & Koubarakis,
    EDBT 2016): per record, keep only its ``meta_keys_per_record`` MOST
    SELECTIVE keys — smallest blocks first, key string as the total-order
    tiebreak.

    Filtering ranks each record's own keys by selectivity and keeps a
    fixed number: identical records keep identical selections (the rank
    depends only on (block size, key)), so true duplicates retain their
    shared rare keys while the hot keys that would dominate the join are
    the ones each record sheds first. Per-record key count is bounded by
    ``r``, making the key table O(records × r) at any corpus size. It
    binds when records carry MANY keys of mixed selectivity (long
    documents); it is vacuous for short records (fewer than ``r`` keys),
    and it cannot conjure selectivity that does not exist — on a
    saturated-vocabulary corpus where every key is hot (the sf0.1
    synthetic transcripts: ~27 shingles/record, median block 304 and the
    purge bound below it), twin recall collapses REGARDLESS of ordering,
    because there is no rare shared key to keep. That regime is the
    MinHash-LSH lane's home turf (full-set Jaccard needs no rare key);
    detect it cheaply with ``blocking.volume_forecast`` (kept rows
    collapse) and ``meta_blocking_eval`` before paying for either.

    Run on the RAW key table, BEFORE :func:`purge_blocks`: ranks must see
    the raw block sizes, because on a corpus whose every block exceeds
    the purge bound a purge-first composition deletes all of a record's
    keys before filtering can choose among them (that is precisely the
    recall collapse this function exists to stop — filtering-then-purging
    keeps each record's least-bad keys, and the purge bound applied to
    the POST-FILTER block sizes almost never binds, because a block only
    retains the records for which it ranked top-r). Node degrees count
    the final kept set. Two window passes: block size over ``key``, rank
    over the record id.
    """
    cfg = cfg or LinkConfig()
    bs = F.count("*").over(Window.partitionBy("key"))
    rk = F.row_number().over(
        Window.partitionBy(*id_cols).orderBy(F.col("_bs").asc(), F.col("key"))
    )
    return (
        keys.withColumn("_bs", bs)
        .withColumn("_rk", rk)
        .filter(F.col("_rk") <= cfg.meta_keys_per_record)
        .drop("_bs", "_rk")
    )


def meta_block_pairs(
    keys: DataFrame, cfg: LinkConfig | None = None
) -> DataFrame:
    """Blocking-graph edges with evidence weights from a purged
    ``(conv_id, key)`` table.

    Output: ``(conv_id_a, conv_id_b, common_keys: bigint, weight: double)``
    with ``conv_id_a < conv_id_b``; ``weight`` is the Jaccard similarity of
    the two records' key sets (JS weighting scheme) — ``common_keys`` is
    the raw co-occurrence count (CBS scheme) for callers that prefer it.

    Shapes: the self-join fans out <= ``meta_purge_size`` per input row
    (purge bound); the pair aggregation map-side combines multi-key
    collisions before the shuffle on the pair id; the per-node key-count
    frame is two ints per record and joins sort-merge on ``conv_id``.
    """
    cfg = cfg or LinkConfig()
    # node degrees count EVERY purged-in key, singletons included (they
    # are real members of the record's block set — see purge_blocks)
    nk = keys.groupBy("conv_id").agg(F.count("*").alias("nk"))
    # ...but only keys shared by >= 2 records can pair: filter them out of
    # the join input so singletons never ride the self-join shuffle
    pairable = (
        keys.withColumn("_bs", F.count("*").over(Window.partitionBy("key")))
        .filter(F.col("_bs") >= 2)
        .drop("_bs")
    )
    # pin the self-join partitioning (candidate_pairs discipline: AQE sizes
    # reducer counts by input bytes and starves the fan-out of cores)
    left = pairable.repartition(cfg.shuffle_partitions, "key")
    pairs = (
        left.alias("a")
        .hint("MERGE")
        .join(
            left.alias("b"),
            on=[
                F.col("a.key") == F.col("b.key"),
                F.col("a.conv_id") < F.col("b.conv_id"),
            ],
        )
        .select(
            F.col("a.conv_id").alias("conv_id_a"),
            F.col("b.conv_id").alias("conv_id_b"),
        )
        .groupBy("conv_id_a", "conv_id_b")
        .agg(F.count("*").alias("common_keys"))
    )
    return (
        pairs.join(
            nk.select(F.col("conv_id").alias("conv_id_a"),
                      F.col("nk").alias("nk_a")),
            "conv_id_a",
        )
        .join(
            nk.select(F.col("conv_id").alias("conv_id_b"),
                      F.col("nk").alias("nk_b")),
            "conv_id_b",
        )
        .select(
            "conv_id_a",
            "conv_id_b",
            "common_keys",
            (
                F.col("common_keys").cast("double")
                / (F.col("nk_a") + F.col("nk_b") - F.col("common_keys"))
            ).alias("weight"),
        )
    )


def cnp_prune(
    weighted: DataFrame, cfg: LinkConfig | None = None
) -> DataFrame:
    """Cardinality node pruning: keep an edge iff it ranks in the
    top-``cfg.meta_top_k`` of EITHER endpoint's neighborhood by
    ``(weight DESC, neighbor ASC)``.

    The union ("redefined node-centric") retention rule is the
    recall-preserving variant from the meta-blocking literature: a hub
    node cannot evict an edge its low-degree partner still values. Ties
    break on the neighbor id, a total order, so the retained set is
    deterministic and reproducible in ANSI SQL. Each node RETAINS at most
    ``meta_top_k`` edges, so the surviving set is bounded by
    ``records * meta_top_k`` — the candidate volume downstream of this
    prune is O(records), not O(records^2) (a single node's degree may
    still exceed k when many partners retain it — that is the union
    rule's recall working as intended).
    """
    cfg = cfg or LinkConfig()
    directed = weighted.select(
        F.col("conv_id_a").alias("src"),
        F.col("conv_id_b").alias("dst"),
        "weight",
    ).unionByName(
        weighted.select(
            F.col("conv_id_b").alias("src"),
            F.col("conv_id_a").alias("dst"),
            "weight",
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("src").orderBy(F.col("weight").desc(), F.col("dst"))
    )
    kept = (
        directed.withColumn("rk", rk)
        .filter(F.col("rk") <= cfg.meta_top_k)
        .select(
            F.least("src", "dst").alias("conv_id_a"),
            F.greatest("src", "dst").alias("conv_id_b"),
        )
        .distinct()
    )
    return weighted.join(kept, ["conv_id_a", "conv_id_b"])


def wnp_prune(weighted: DataFrame) -> DataFrame:
    """Weight node pruning (WNP): keep an edge iff its evidence reaches the
    AVERAGE of either endpoint's neighborhood.

    The threshold-based alternative to :func:`cnp_prune` — adaptive rather
    than fixed-cardinality: a node in a dense duplicate neighborhood keeps
    more edges than ``k``, an isolated node with one strong neighbor keeps
    exactly that one. Same union retention rule.

    The pruning weight is deliberately the INTEGER ``common_keys`` (CBS
    scheme), not the float ``weight``: per-node averages are sums, and
    float summation order differs between engines/shuffles while int64
    sums are exact in any order — the average is then a single IEEE
    division of exact ints and the ``>=`` comparison is bit-reproducible
    (the same discipline that makes the JS weight itself twin-safe).
    """
    directed = weighted.select(
        F.col("conv_id_a").alias("src"),
        F.col("conv_id_b").alias("dst"),
        "common_keys",
    ).unionByName(
        weighted.select(
            F.col("conv_id_b").alias("src"),
            F.col("conv_id_a").alias("dst"),
            "common_keys",
        )
    )
    w = Window.partitionBy("src")
    kept = (
        directed
        .withColumn(
            "_avg",
            F.sum("common_keys").over(w).cast("double")
            / F.count("*").over(w),
        )
        .filter(F.col("common_keys").cast("double") >= F.col("_avg"))
        .select(
            F.least("src", "dst").alias("conv_id_a"),
            F.greatest("src", "dst").alias("conv_id_b"),
        )
        .distinct()
    )
    return weighted.join(kept, ["conv_id_a", "conv_id_b"])


def link_meta_pairs(
    keys_a: DataFrame, keys_b: DataFrame, cfg: LinkConfig | None = None
) -> DataFrame:
    """Cross-corpus (bipartite) meta-blocking: evidence-weighted A×B pairs
    from two purged-together ``(conv_id, key)`` lanes.

    The two-corpus analog of :func:`meta_block_pairs` for record LINKAGE
    (translink/linkage.py): token/shingle keys are the standard blocking
    fallback when the corpora's attribute keys do not align. Purging runs
    over the COMBINED block — a key hot across both sides is still a
    stop-word — and additionally requires the key to appear on BOTH sides
    (a single-side block pairs nothing across corpora, however small).
    Per-key join fan-out is bounded by ``(purge/2)^2``; only A-side ×
    B-side pairs are generated, never within-side.

    Output: ``(conv_id_a, conv_id_b, common_keys, weight)`` where ``_a``
    ids come from ``keys_a`` and ``_b`` ids from ``keys_b`` (ids may
    collide across corpora — the sides stay separate frames throughout,
    so a collision never conflates records).
    """
    cfg = cfg or LinkConfig()
    tagged = keys_a.withColumn("_side", F.lit("a")).unionByName(
        keys_b.withColumn("_side", F.lit("b"))
    )
    # block filtering FIRST, on the raw COMBINED block sizes, per (side,
    # record): each record keeps its most selective keys; identical
    # cross-corpus twins select identically (see filter_blocks on why
    # filter-then-purge, not the reverse)
    bs = F.count("*").over(Window.partitionBy("key"))
    rk = F.row_number().over(
        Window.partitionBy("_side", "conv_id")
        .orderBy(F.col("_bs").asc(), F.col("key"))
    )
    filt = (
        tagged.withColumn("_bs", bs)
        .withColumn("_rk", rk)
        .filter(F.col("_rk") <= cfg.meta_keys_per_record)
        .drop("_bs", "_rk")
    )
    # hard fan-out guard on the POST-FILTER combined blocks; single-side
    # keys and singletons cross-pair nothing below but still count in
    # lm_nk (the JS denominator)
    bs2 = F.count("*").over(Window.partitionBy("key"))
    kept = (
        filt.withColumn("_bs2", bs2)
        .filter(F.col("_bs2") <= cfg.meta_purge_size)
        .drop("_bs2")
    )
    nk = kept.groupBy("_side", "conv_id").agg(F.count("*").alias("nk"))
    left = kept.filter(F.col("_side") == "a").select("conv_id", "key")
    right = kept.filter(F.col("_side") == "b").select("conv_id", "key")
    pairs = (
        left.repartition(cfg.shuffle_partitions, "key").alias("a")
        .hint("MERGE")
        .join(right.repartition(cfg.shuffle_partitions, "key").alias("b"),
              F.col("a.key") == F.col("b.key"))
        .select(
            F.col("a.conv_id").alias("conv_id_a"),
            F.col("b.conv_id").alias("conv_id_b"),
        )
        .groupBy("conv_id_a", "conv_id_b")
        .agg(F.count("*").alias("common_keys"))
    )
    return (
        pairs.join(
            nk.filter(F.col("_side") == "a").select(
                F.col("conv_id").alias("conv_id_a"), F.col("nk").alias("nk_a")
            ),
            "conv_id_a",
        )
        .join(
            nk.filter(F.col("_side") == "b").select(
                F.col("conv_id").alias("conv_id_b"), F.col("nk").alias("nk_b")
            ),
            "conv_id_b",
        )
        .select(
            "conv_id_a",
            "conv_id_b",
            "common_keys",
            (
                F.col("common_keys").cast("double")
                / (F.col("nk_a") + F.col("nk_b") - F.col("common_keys"))
            ).alias("weight"),
        )
    )


def cnp_prune_bipartite(
    weighted: DataFrame, cfg: LinkConfig | None = None
) -> DataFrame:
    """CNP pruning over a bipartite (cross-corpus) weighted pair set: keep
    a pair iff it ranks in the top-``meta_top_k`` of its A-side record's
    B-neighbors OR of its B-side record's A-neighbors.

    Simpler than the unipartite union trick — the two directions are
    already distinct columns, so both ranks compute on the same frame with
    two windows. Ties break on the partner id (total order, twin-safe).
    """
    cfg = cfg or LinkConfig()
    ra = F.row_number().over(
        Window.partitionBy("conv_id_a")
        .orderBy(F.col("weight").desc(), F.col("conv_id_b"))
    )
    rb = F.row_number().over(
        Window.partitionBy("conv_id_b")
        .orderBy(F.col("weight").desc(), F.col("conv_id_a"))
    )
    return (
        weighted.withColumn("_ra", ra).withColumn("_rb", rb)
        .filter((F.col("_ra") <= cfg.meta_top_k)
                | (F.col("_rb") <= cfg.meta_top_k))
        .drop("_ra", "_rb")
    )
