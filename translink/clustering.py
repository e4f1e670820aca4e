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
    """Connect each strictly-larger neighbor to the neighborhood minimum."""
    sym = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect all smaller-or-equal neighbors (and the center) to the min."""
    # edges already oriented u > v
    m = e.groupBy("u").agg(F.min("v").alias("m"))
    joined = e.join(m, "u")
    center = m.select(F.col("u").alias("n"), F.col("m"))
    leaves = joined.select(F.col("v").alias("n"), F.col("m"))
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
    """
    from pyspark.sql import Observation

    cfg = cfg or LinkConfig()

    def _observed_checkpoint(df: DataFrame):
        obs = Observation()
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).localCheckpoint(eager=True)
        metrics = obs.get
        return out, (metrics["n"], metrics["h"])

    e, prev = _observed_checkpoint(_canonical_edges(edges))
    converged = False
    for _ in range(cfg.cc_max_iterations):
        e, cur = _observed_checkpoint(_small_star(_large_star(e)))
        if cur == prev:
            converged = True
            break
        prev = cur
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
