"""Stage 5 — transitive clustering.

The reference clusters greedily: first unused record absorbs every later
record above threshold (``src/pipeline/stats.rs:296-326``) — order-dependent
and single-threaded. We replace it with true transitive closure: iterative
large-star / small-star connected components (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) expressed as alternating
DataFrame aggregations. Converges in O(log^2 n) rounds; every round is two
shuffles; lineage is truncated per round with localCheckpoint (SURVEY §7.4.3).

The exact-duplicate path bypasses edges entirely: byte-equal digests form
clusters directly by group-by (reference's nested exact refinement C2,
``src/pipeline/streaming_hash.rs:132-202``) and contribute one linear edge
per member to the similarity graph, so exact groups and near-dup edges merge
into joint components without quadratic edge expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from translink.config import LinkConfig


def exact_clusters(signed: DataFrame) -> DataFrame:
    """Clusters of byte-identical canonical text: group by digest, cluster id
    = min conv_id of the group (deterministic tie-break). One shuffle.

    Returns (conv_id, cluster_id, group_size) for groups with >= 2 members —
    the dup/unique split every reference stage performs (A6,
    src/pipeline/metadata.rs:51-63).
    """
    w = Window.partitionBy("digest", "digest_md5")
    return (
        signed
        .select(
            "conv_id",
            "digest",
            "digest_md5",
            F.min("conv_id").over(w).alias("cluster_id"),
            F.count("*").over(w).alias("group_size"),
        )
        .filter(F.col("group_size") >= 2)
        .select("conv_id", "cluster_id", "group_size")
    )


def exact_edges(signed: DataFrame) -> DataFrame:
    """Linear (star-shaped) edges for the exact path: each member connects to
    the group's min conv_id. n-1 edges per group instead of n(n-1)/2."""
    w = Window.partitionBy("digest", "digest_md5")
    return (
        signed
        .select(
            "conv_id",
            F.min("conv_id").over(w).alias("root"),
        )
        .filter(F.col("conv_id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("conv_id").alias("dst"))
    )


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Orient every edge (hi -> lo), drop self-loops and duplicates."""
    return (
        edges
        .select(
            F.greatest("src", "dst").alias("u"),
            F.least("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect each strictly-larger neighbor to the neighborhood minimum.

    One window over the symmetrized edges instead of groupBy+self-join:
    the neighborhood minimum rides the same shuffle that groups the
    neighborhood, halving the loop's per-round exchanges (the rounds are
    barrier-latency-bound, not data-bound — see connected_components).
    The intermediate distinct() is intentionally absent: the next star's
    window min is duplicate-insensitive and its trailing distinct dedupes
    the round output, so dropping it removes a third shuffle per round
    without changing any round's (count, hash) signature (A/B-verified).
    """
    sym = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect all smaller-or-equal neighbors (and the center) to the min."""
    # edges already oriented u > v; same window-over-one-shuffle shape as
    # _large_star
    w = Window.partitionBy("u")
    x = e.withColumn("m", F.min("v").over(w))
    leaves = x.select(F.col("v").alias("n"), F.col("m"))
    center = x.select(F.col("u").alias("n"), F.col("m"))
    return (
        leaves.union(center)
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, cfg: LinkConfig | None = None
) -> DataFrame:
    """Resolve the similarity graph into components.

    Returns (conv_id, cluster_id) for every node that appears in an edge;
    cluster_id is the component's minimum conv_id (deterministic label).
    Callers union singletons back in (conv_id -> itself) if needed.

    Convergence: iterate large-star/small-star until the edge set is a fixed
    point (checked with count + bit_xor hash — overflow-safe under ANSI).
    Each iteration localCheckpoints to truncate lineage; the signature rides
    the SAME job as the eager checkpoint via ``Observation`` (measured to
    populate on ``localCheckpoint(eager=True)``), so every round costs one
    driver action instead of two — iteration-barrier latency is the flat,
    per-round cost that does not amortize with input size.

    Loop partitioning is ADAPTIVE: the rounds inherit the session's
    ``spark.sql.shuffle.partitions`` only when the observed edge count
    warrants it — for the post-blocking similarity graphs this engine
    produces (sparse: near-dup edges, not the corpus), a 4×cores setting
    means hundreds of near-empty tasks per round and the loop becomes
    pure scheduler latency (measured 6.5s → 2.9s at 550k edges, 32
    cores, by dropping 128 → 16 loop partitions). The session value is
    temporarily lowered to ``clamp(edges / 100k, 16, session)`` for the
    loop body and restored in ``finally``; the loop is driver-synchronous
    so nothing else plans under the temporary value.
    """
    from pyspark.sql import Observation

    cfg = cfg or LinkConfig()
    spark = edges.sparkSession

    def _observed_checkpoint(df: DataFrame):
        obs = Observation()
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).localCheckpoint(eager=True)
        metrics = obs.get
        return out, (metrics["n"], metrics["h"])

    # first pass (canonical orientation + dedup) runs at the session
    # setting — it consumes the real upstream edge lineage
    e, prev = _observed_checkpoint(_canonical_edges(edges))
    session_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # never EXCEED the session setting: at a tiny session value (unit tests
    # run at 4) the old max-outside form inverted the clamp and raised the
    # loop to 16 tasks on a 4-slot session
    loop_sp = min(int(session_sp), max(16, int(prev[0]) // 100_000 + 1))
    converged = False
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_sp))
        for _ in range(cfg.cc_max_iterations):
            e, cur = _observed_checkpoint(_small_star(_large_star(e)))
            if cur == prev:
                converged = True
                break
            prev = cur
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", session_sp)
    if not converged:
        # A non-converged edge set yields labels that are not component
        # minima — a silently wrong, non-transitive clustering. Fail loudly:
        # callers either raise cc_max_iterations (convergence is O(log^2 n)
        # rounds, so 50 covers any realistic graph) or fix the input.
        raise RuntimeError(
            f"connected_components did not reach the edge-set fixed point "
            f"within cc_max_iterations={cfg.cc_max_iterations} rounds; "
            f"raising the limit is safe (each round is 2 shuffles)"
        )
    # Fixed point of small-star: every edge points node -> component min.
    members = e.select(F.col("u").alias("conv_id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("conv_id"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).distinct()


def clusters_by_contraction(
    signed: DataFrame, sim_edges: DataFrame, cfg: LinkConfig | None = None
) -> DataFrame:
    """Full cluster assembly with the exact-duplicate mass contracted out
    of the iterative CC.

    In a crawl-scale corpus the exact-duplicate star edges dominate the
    graph (the dup mass), yet they are already resolved: every digest
    group is a connected subgraph whose minimum IS the group
    representative. Contract each group to its rep BEFORE the loop —
    similarity edges are rewritten onto reps and large/small-star runs
    only over that sparse contracted graph; the group members never ride
    a round's shuffle. Label-identical to ``connected_components`` over
    ``sim_edges ∪ exact_edges(signed)`` + ``clusters_with_singletons``
    (the component minimum over reps is the minimum over all members,
    since each member >= its group rep; A/B hash-verified and pinned by
    pytest + the clusters query's recursive-CTE oracle).

    Returns (conv_id, cluster_id) for EVERY conversation (singletons
    label themselves via their rep).

    Cost: one digest window over ``signed`` (the same pass exact_edges
    made), two rep-lookup joins sized by the SPARSE sim edge set, the CC
    loop over contracted edges, and one label join back — each a single
    shuffle that scales with cores, none iterated.
    """
    cfg = cfg or LinkConfig()
    w = Window.partitionBy("digest", "digest_md5")
    # one window pass; checkpointed because it feeds three consumers
    # (two contraction joins + the final label join)
    reps = signed.select(
        "conv_id", F.min("conv_id").over(w).alias("rep")
    ).localCheckpoint(eager=True)
    contracted = (
        sim_edges.select("src", "dst")
        .join(reps.select(F.col("conv_id").alias("src"),
                          F.col("rep").alias("u")), "src")
        .join(reps.select(F.col("conv_id").alias("dst"),
                          F.col("rep").alias("v")), "dst")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    components = connected_components(contracted, cfg)
    labels = components.select(F.col("conv_id").alias("rep"), "cluster_id")
    return (
        reps.join(labels, "rep", "left")
        .select(
            "conv_id",
            F.coalesce("cluster_id", "rep").alias("cluster_id"),
        )
    )


def clusters_with_singletons(
    all_ids: DataFrame, components: DataFrame
) -> DataFrame:
    """Union the component labels with singleton self-clusters for every id
    not in any component (the reference re-merges Skip-ped unique files the
    same way, ``src/pipeline/mod.rs:99-118``)."""
    return (
        all_ids.select("conv_id")
        .join(components, "conv_id", "left")
        .select(
            "conv_id",
            F.coalesce("cluster_id", "conv_id").alias("cluster_id"),
        )
    )
