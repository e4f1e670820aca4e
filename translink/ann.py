"""Approximate-nearest-neighbor search over an embedding column.

Three paths over ``embeddings(vec_id, embedding: array<float>, label)``:

  - ``cosine_topk`` — exact brute force: query set x corpus join, cosine in
    a JVM fold (zip_with + aggregate, whole-stage codegen; deterministic
    left-to-right double summation so a DuckDB oracle can reproduce it
    bit-for-bit). The correctness baseline.
  - ``cosine_topk_lsh`` — random-hyperplane LSH: vectors bucketed by the
    sign pattern of ``n_planes`` fixed seeded hyperplanes; top-k runs inside
    (query-bucket) groups only. The 100TB path: bucket sizes, not corpus
    size, bound the join fan-out.
  - ``cosine_topk_ivf`` — inverted-file index: spherical-k-means cells
    trained on a bounded sample; queries probe their ``n_probe`` nearest
    cells. One cell per corpus vector (no pair dedup), data-adaptive
    partitioning; the alternative scale path.

The same machinery powers the embedding-cosine NEAR-DUP family (the fifth
dedup strategy beside exact / MinHash-LSH / SimHash / n-gram Jaccard):
``cosine_dup_pairs`` (exact threshold pairs, oracle baseline),
``cosine_dup_pairs_lsh`` (bucketed candidates + Arrow cosine, the corpus-
scale path), and ``cosine_dup_clusters`` (large-star/small-star
connected-components resolution of the threshold graph).

The hyperplanes are literal arrays baked into the plan (seeded numpy), so
the operator is deterministic and needs no broadcast variable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType


def _cos_expr(a: str, b: str) -> F.Column:
    """Deterministic cosine similarity between two float-array columns,
    computed in doubles with a sequential fold.

    NULL (not an error, not a partial value) for degenerate operands: NULL
    vectors, an element-level NULL, mismatched dimensionality, or a zero
    norm. try_divide carries most of the contract with no duplicated
    subexpressions: plain ANSI Divide THROWS on a zero divisor even when
    the numerator is NULL (one empty vector would kill a whole cartesian
    scoring stage), while ragged/NULL-element operands already
    null-propagate through the fold (zip_with pads with NULL, the sum
    absorbs it). The nanvl wrapper closes the remaining hole: a NaN/Inf
    ELEMENT makes the fold NaN (try_divide passes NaN through), and Spark
    orders NaN ABOVE every real double and evaluates ``NaN >= tau`` as
    true — one NaN vector in the corpus would otherwise top every query's
    top-k and pass every dup threshold. The DuckDB twins need explicit
    guards for the same semantics because list_sum SKIPS NULLs (silent
    PARTIAL dot products on ragged/NULL-element pairs) and NaN compares
    greater-than-everything there too."""
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )
    na = (
        f"sqrt(aggregate({a}, cast(0.0 as double), "
        f"(acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    nb = (
        f"sqrt(aggregate({b}, cast(0.0 as double), "
        f"(acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    return F.expr(
        f"nanvl(try_divide({dot}, {na} * {nb}), cast(null as double))"
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of every query vector.

    ``queries`` is a (id, vector) DataFrame (often a filtered slice of the
    corpus). The join is a cross product queries x corpus — correct baseline
    at any corpus size only when the query set is small; use
    ``cosine_topk_lsh`` for query sets that scale with the corpus.
    Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cos_expr("_qv", "_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _make_bucket_kernel(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """Arrow kernel computing ALL LSH-table buckets of a vector in one pass.

    The per-table hyperplanes stack into ONE (dim, n_tables*n_planes) matrix;
    per Arrow batch the kernel does a single numpy matmul, takes signs, and
    packs each table's ``n_planes`` sign bits into its bucket id. One corpus
    scan and one BLAS call replace the n_tables separate full scans (each
    evaluating interpreted ``aggregate(zip_with(...))`` folds) of the
    expression formulation — the difference between an O(tables) and an O(1)
    number of passes over 100 TB of embeddings."""
    planes = np.hstack([
        np.random.default_rng(seed + 7919 * t).standard_normal((n_planes, dim)).T
        for t in range(n_tables)
    ])  # (dim, n_tables * n_planes)
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def bucket_kernel(vecs: pd.Series) -> pd.Series:
        # one malformed row (null / wrong length) must not fail the stage:
        # it gets a NULL bucket array, which posexplode then drops from the
        # candidate keys — the bad vector silently exits the LSH path
        # instead of killing the job
        n = len(vecs)
        arrs = []
        valid_idx = []
        for i, v in enumerate(vecs):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            # a zero-norm vector has no direction: every hyperplane test
            # degenerates to sign(0) — ALL zero vectors would share one
            # bucket in EVERY table, a planted n^2 hot key (same failure
            # class as the SimHash empty-doc sentinel). Cosine against a
            # zero vector is undefined anyway, so they exit the LSH path.
            # non-finite vectors exit the same way: a NaN element makes
            # every hyperplane test sign(NaN >= 0) = False, funneling ALL
            # NaN vectors into one shared bucket per table — and their
            # cosine is NaN anyway, filtered after the join
            if a.shape == (dim,) and np.all(np.isfinite(a)) and np.any(a):
                arrs.append(a)
                valid_idx.append(i)
        out = [None] * n
        if arrs:
            X = np.stack(arrs)
            signs = (X @ planes) >= 0.0                  # (m, tables*planes)
            buckets = signs.reshape(len(arrs), n_tables, n_planes) \
                .astype(np.int64) @ weights
            for j, i in enumerate(valid_idx):
                out[i] = buckets[j].tolist()
        return pd.Series(out, dtype=object)

    return bucket_kernel


def with_hyperplane_bucket(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``bucket: bigint`` — the sign pattern of the vector against
    ``n_planes`` fixed hyperplanes (SimHash for cosine distance). Vectors
    with high cosine similarity land in the same bucket with probability
    ``(1 - theta/pi)^n_planes``. Single-table case of the bucket kernel."""
    kern = _make_bucket_kernel(dim, n_planes, n_tables=1, seed=seed)
    return embeddings.withColumn(
        "bucket", F.element_at(kern(F.col(vec_col)), 1)
    )


def hyperplane_bucket_keys(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_array: bool = False,
) -> DataFrame:
    """Multi-table hyperplane LSH keys: one row per (vector, table) with that
    table's sign-pattern bucket. OR-amplification across tables: two vectors
    are candidates if they share a bucket in ANY table — recall
    1 - (1 - p^n_planes)^n_tables for per-plane agreement p = 1 - theta/pi.

    ONE scan of the input: the Arrow bucket kernel emits every table's bucket
    as an array, ``posexplode`` turns it into (table_id, bucket) keys.

    ``keep_array=True`` additionally retains the whole per-table bucket
    array as ``_bks`` on every exploded row. Consumers use it for
    first-colliding-table pair dedup (see ``cosine_dup_pairs_lsh``): it
    costs ``n_tables * 8`` extra bytes per exploded row on the candidate
    join's input exchange, and in return the OUTPUT-side dedup exchange
    (sized by the collision-pair count, quadratic in bucket occupancy)
    disappears entirely.
    """
    kern = _make_bucket_kernel(dim, n_planes, n_tables, seed)
    cols = [F.col(id_col), F.col(vec_col)]
    if keep_array:
        cols.append(kern(F.col(vec_col)).alias("_bks"))
        return embeddings.select(*cols).select(
            id_col, vec_col, "_bks",
            F.posexplode("_bks").alias("table_id", "bucket"),
        )
    return embeddings.select(
        *cols,
        F.posexplode(kern(F.col(vec_col))).alias("table_id", "bucket"),
    )


@pandas_udf(DoubleType())
def _cosine_kernel(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched numpy cosine similarity between two float-array columns —
    the hot-path replacement for the interpreted ``aggregate`` fold
    (``_cos_expr`` stays as the deterministic oracle baseline; this kernel
    is ~100x faster on candidate ranking at scale).

    A null or length-mismatched pair scores NaN instead of failing the
    stage (the SQL fold null-propagates per row; the kernel must not be
    weaker). Rows are grouped by vector length so the einsum stays
    rectangular — one group in the normal fixed-dim case."""
    n = len(a)
    out = np.full(n, np.nan, dtype=np.float64)
    if n == 0:
        return pd.Series(out)
    la = np.fromiter(
        (len(v) if v is not None else -1 for v in a), dtype=np.int64, count=n
    )
    lb = np.fromiter(
        (len(v) if v is not None else -1 for v in b), dtype=np.int64, count=n
    )
    valid = (la > 0) & (la == lb)
    va, vb = a.to_numpy(), b.to_numpy()   # object arrays; ONE pandas exit
    for d in np.unique(la[valid]):
        idx = np.nonzero(valid & (la == d))[0]
        # np.stack over the object array is a C-level gather per row —
        # ~10x the throughput of a per-row .iloc/asarray comprehension on
        # million-pair candidate batches
        A = np.stack(va[idx]).astype(np.float64, copy=False)
        B = np.stack(vb[idx]).astype(np.float64, copy=False)
        dot = np.einsum("ij,ij->i", A, B)
        na = np.sqrt(np.einsum("ij,ij->i", A, A))
        nb = np.sqrt(np.einsum("ij,ij->i", B, B))
        with np.errstate(divide="ignore", invalid="ignore"):
            out[idx] = dot / (na * nb)
    return pd.Series(out)


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates are vectors sharing any LSH table
    bucket with the query; exact cosine then ranks the candidates. Recall
    < 1 by construction (measured against the exact baseline in tests);
    join fan-out is per-bucket per-table, so the plan survives corpus
    scale-up — tune n_planes (bucket size) and n_tables (recall) instead of
    paying the full cross product."""
    c = hyperplane_bucket_keys(
        embeddings, dim, n_planes, n_tables, seed, id_col, vec_col,
        keep_array=True,
    ).select(F.col(id_col).alias("neighbor_id"),
             F.col("_bks").alias("_bc"), "table_id", "bucket")
    q = hyperplane_bucket_keys(
        queries, dim, n_planes, n_tables, seed, id_col, vec_col,
        keep_array=True,
    ).select(F.col(id_col).alias("query_id"),
             F.col("_bks").alias("_bq"), "table_id", "bucket")
    # a pair colliding in several tables scores once: keep it only at its
    # FIRST colliding table (both sides carry their bucket arrays; a codegen
    # filter checks no earlier table agreed) — this replaces a distinct
    # whose exchange is sized by the raw collision count, and vectors still
    # join from the ORIGINAL (unexploded) frames so embeddings never ride
    # the multi-table exchange
    cand_ids = (
        q.join(c, on=["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .filter(F.expr(
            "array_position(zip_with(_bq, _bc, (x, y) -> x = y), true) "
            "= table_id + 1"
        ))
        .select("query_id", "neighbor_id")
    )
    cand = (
        cand_ids
        .join(queries.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias("_qv")), "query_id")
        .join(embeddings.select(F.col(id_col).alias("neighbor_id"),
                                F.col(vec_col).alias("_cv")), "neighbor_id")
    )
    scored = cand.withColumn(
        "cosine", _cosine_kernel(F.col("_qv"), F.col("_cv"))
    ).filter(F.col("cosine").isNotNull() & ~F.isnan("cosine"))
    # NaN (malformed pair / zero-norm vector) must not outrank real scores —
    # Spark sorts NaN above every double in a descending order-by
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _train_centroids(
    X: np.ndarray, n_centroids: int, iters: int, rng: np.random.Generator
) -> np.ndarray:
    """Spherical k-means (unit-norm centroids, cosine objective) with
    kmeans++ seeding — numpy on the driver over a BOUNDED sample, the way
    IVF coarse quantizers are normally trained (the index must not require
    a pass over 100 TB to build). Deterministic given the rng."""
    # an empty sample reaches the diagnostic below, not numpy's AxisError:
    # np.linalg.norm(np.array([]), axis=1) raises before the n == 0 check
    X = X.reshape(0, 1) if X.size == 0 else X
    # non-finite rows must not reach normalization: an Inf element passes
    # the ``norms > 0`` test and then injects NaN (inf/inf) into a training
    # row, which the mean step smears across a whole centroid
    X = X[np.isfinite(X).all(axis=1)]
    X = X.reshape(0, 1) if X.size == 0 else X
    norms = np.linalg.norm(X, axis=1)
    Xn = X[norms > 0] / norms[norms > 0, None]
    n = Xn.shape[0]
    if n == 0:
        # empty table / every sampled vector null, mis-sized, or zero-norm:
        # fail with a diagnosis instead of rng.integers(0)'s ValueError
        raise ValueError(
            "IVF training sample contains no usable vectors "
            "(all rows empty, wrong-dimension, or zero-norm)"
        )
    k = min(n_centroids, n)
    # kmeans++: first pick uniform, then proportional to cosine distance
    # to the nearest already-picked centroid
    idx = [int(rng.integers(n))]
    sims = Xn @ Xn[idx[0]]
    for _ in range(k - 1):
        d = np.maximum(1.0 - sims, 0.0)
        if d.sum() <= 0:
            break
        j = int(rng.choice(n, p=d / d.sum()))
        idx.append(j)
        sims = np.maximum(sims, Xn @ Xn[j])
    C = Xn[idx].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(C.shape[0]):
            members = Xn[assign == j]
            if len(members) == 0:
                continue  # empty cell keeps its old centroid
            m = members.mean(axis=0)
            nm = np.linalg.norm(m)
            if nm > 0:
                C[j] = m / nm
    return C


def _make_probe_kernel(centroids: np.ndarray, n_probe: int):
    """Arrow kernel: top-``n_probe`` nearest centroid ids (by cosine) per
    vector, one numpy matmul per batch. The centroid matrix is baked into
    the closure (k x dim doubles — a few hundred KB at most), so the
    operator needs no broadcast variable and stays deterministic."""
    C = centroids.astype(np.float64)
    dim = C.shape[1]
    p = min(n_probe, C.shape[0])

    @pandas_udf(ArrayType(LongType()))
    def probe_kernel(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        arrs, valid_idx = [], []
        for i, v in enumerate(vecs):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            # zero-norm and non-finite vectors have no direction: they'd
            # normalize to NaN (0/0, inf/inf) and probe garbage cells —
            # their cosine is undefined, so they exit the IVF path here
            if a.shape == (dim,) and np.all(np.isfinite(a)) and np.any(a):
                arrs.append(a)
                valid_idx.append(i)
        out = [None] * n  # malformed rows exit the IVF path, not the job
        if arrs:
            X = np.stack(arrs)
            norms = np.linalg.norm(X, axis=1)
            sims = (X / norms[:, None]) @ C.T
            # top-p centroid ids, nearest first (stable id tie-break)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :p]
            for j, i in enumerate(valid_idx):
                out[i] = order[j].tolist()
        return pd.Series(out, dtype=object)

    return probe_kernel


def train_ivf_centroids(
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 64,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Collect a bounded deterministic sample (per-partition top-N by
    ``xxhash64(id)`` merged on the driver — TakeOrderedAndProject, no full
    sort) and train the coarse quantizer on it."""
    rows = (
        embeddings
        .filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .select(F.col(vec_col), F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h")
        .limit(sample_size)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    return _train_centroids(X, n_centroids, iters, np.random.default_rng(seed))


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_centroids: int = 64,
    n_probe: int = 8,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is partitioned
    into ``n_centroids`` Voronoi cells of a spherical-k-means coarse
    quantizer; each query probes its ``n_probe`` nearest cells and ranks
    only their members by exact cosine.

    The scale shape vs ``cosine_topk_lsh``: each corpus vector lives in
    exactly ONE cell (no multi-table duplication, no pair dedup needed),
    candidate volume is ``n_probe/n_centroids`` of the corpus per query,
    and recall/cost tune smoothly via ``n_probe``. Cell population is
    data-adaptive (centroids follow density) where LSH buckets are fixed
    geometry — the standard IVF advantage on clustered embeddings. Grow
    ``n_centroids`` ~ sqrt(corpus) at scale to bound cell size.
    """
    C = train_ivf_centroids(
        embeddings, dim, n_centroids, sample_size, 10, seed, id_col, vec_col
    )
    kern = _make_probe_kernel(C, n_probe)
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        F.element_at(kern(F.col(vec_col)), 1).alias("cell"),
    ).filter(F.col("cell").isNotNull())
    probes = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.explode(kern(F.col(vec_col))).alias("cell"),
    )
    scored = (
        probes.join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_kernel(F.col("_qv"), F.col("_cv")))
        .filter(F.col("cosine").isNotNull() & ~F.isnan("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_dup_pairs(
    embeddings: DataFrame,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (a < b) pair with
    ``cosine(a, b) >= tau``. The dedup analog of ``cosine_topk`` — same
    deterministic double fold (``_cos_expr``), so a DuckDB oracle reproduces
    it bit-for-bit.

    O(n^2) cross self-join by construction: the correctness baseline, sized
    for labeled slices and oracle checks. The corpus-scale path is
    ``cosine_dup_pairs_lsh`` (bucketed candidates, Arrow cosine).
    """
    a = embeddings.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("_va")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn("cosine", _cos_expr("_va", "_vb"))
        .filter(F.col("cosine") >= F.lit(float(tau)))
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def cosine_dup_pairs_lsh(
    embeddings: DataFrame,
    tau: float = 0.9,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale: candidates are
    id pairs sharing a hyperplane-LSH bucket in ANY table; exact cosine (one
    Arrow kernel pass) then applies the ``tau`` threshold.

    Scale shape: ONE corpus scan emits every table's bucket (single matmul
    per Arrow batch), the self-join fans out per (table, bucket) — bucket
    geometry, not corpus size, bounds the join — and pair ids are
    deduplicated BEFORE vectors are fetched, so embeddings never ride the
    multi-table exchange. Zero-norm vectors are routed off the path inside
    the bucket kernel (null bucket): they have no cosine and would otherwise
    share one sentinel bucket per table. Recall for pairs at cosine c is
    ``1 - (1 - p^n_planes)^n_tables`` with ``p = 1 - acos(c)/pi`` — at the
    near-dup thresholds this operator is for (tau >= 0.9, p >= 0.856) the
    defaults give recall > 0.98; measured against ``cosine_dup_pairs`` in
    tests/test_ann.py.
    """
    keys = hyperplane_bucket_keys(
        embeddings, dim, n_planes, n_tables, seed, id_col, vec_col,
        keep_array=True,
    )
    a = keys.select(F.col(id_col).alias("vec_id_a"),
                    F.col("_bks").alias("_ba"), "table_id", "bucket")
    b = keys.select(F.col(id_col).alias("vec_id_b"),
                    F.col("_bks").alias("_bb"), "table_id", "bucket")
    # A pair colliding in several tables must score once. Instead of a
    # distinct over the joined pair ids — an exchange sized by the raw
    # COLLISION count (quadratic in bucket occupancy; at wide-bucket
    # parameters it dwarfs the corpus) — keep a pair only at its FIRST
    # colliding table: both sides carry their full bucket array
    # (n_tables longs), and a codegen filter checks no earlier table
    # agreed. Each surviving pair appears exactly once, no dedup exchange.
    # Null buckets (zero-norm vectors) never equal anything in zip_with's
    # x = y, so they cannot register as an earlier collision.
    cand_ids = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .filter(F.expr(
            "array_position(zip_with(_ba, _bb, (x, y) -> x = y), true) "
            "= table_id + 1"
        ))
        .select("vec_id_a", "vec_id_b")
    )
    cand = (
        cand_ids
        .join(embeddings.select(F.col(id_col).alias("vec_id_a"),
                                F.col(vec_col).alias("_va")), "vec_id_a")
        .join(embeddings.select(F.col(id_col).alias("vec_id_b"),
                                F.col(vec_col).alias("_vb")), "vec_id_b")
    )
    return (
        cand
        .withColumn("cosine", _cosine_kernel(F.col("_va"), F.col("_vb")))
        .filter(
            F.col("cosine").isNotNull()
            & ~F.isnan("cosine")
            & (F.col("cosine") >= F.lit(float(tau)))
        )
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def cosine_dup_clusters(
    embeddings: DataFrame,
    tau: float = 0.9,
    method: str = "exact",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate CLUSTERS: threshold pairs resolved
    into components by the same large-star/small-star connected-components
    loop the transcript pipeline uses (translink/clustering.py), singletons
    labeled as their own cluster. Returns (vec_id, cluster_id) with
    cluster_id = the component's minimum vec_id.

    ``method='exact'`` edges come from ``cosine_dup_pairs`` (oracle
    baseline); ``method='lsh'`` from ``cosine_dup_pairs_lsh`` (corpus-scale
    path — CC cost then scales with the EDGE set, which near-dup thresholds
    keep sparse, not with the corpus).
    """
    from translink.clustering import (
        clusters_with_singletons, connected_components,
    )

    if method == "exact":
        pairs = cosine_dup_pairs(embeddings, tau, id_col, vec_col)
    elif method == "lsh":
        pairs = cosine_dup_pairs_lsh(
            embeddings, tau, dim, n_planes, n_tables, seed, id_col, vec_col
        )
    else:
        raise ValueError(f"unknown method {method!r} (want 'exact' or 'lsh')")
    edges = pairs.select(
        F.col("vec_id_a").alias("src"), F.col("vec_id_b").alias("dst")
    )
    comp = connected_components(edges)
    all_ids = embeddings.select(F.col(id_col).alias("conv_id"))
    return clusters_with_singletons(all_ids, comp).select(
        F.col("conv_id").alias("vec_id"), "cluster_id"
    )


def _make_cell_sim_kernel(centroids: np.ndarray):
    """Arrow kernel: (nearest centroid id, cosine to it) per vector — the
    ``n_probe=1`` probe kernel extended with the winning similarity, which
    the SemDeDup keep policy needs (keep the member FARTHEST from its cell
    centroid). Same degenerate-vector contract as ``_make_probe_kernel``:
    NULL struct for null / mis-sized / zero-norm / non-finite rows."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    C = centroids.astype(np.float64)
    dim = C.shape[1]

    @pandas_udf(StructType([
        StructField("cell", LongType()),
        StructField("cent_sim", DoubleType()),
    ]))
    def cell_sim_kernel(vecs: pd.Series) -> pd.DataFrame:
        n = len(vecs)
        arrs, valid_idx = [], []
        for i, v in enumerate(vecs):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.shape == (dim,) and np.all(np.isfinite(a)) and np.any(a):
                arrs.append(a)
                valid_idx.append(i)
        cell = np.full(n, np.nan)
        sim = np.full(n, np.nan)
        if arrs:
            X = np.stack(arrs)
            norms = np.linalg.norm(X, axis=1)
            sims = (X / norms[:, None]) @ C.T
            best = np.argmax(sims, axis=1)
            cell[valid_idx] = best
            sim[valid_idx] = sims[np.arange(len(arrs)), best]
        return pd.DataFrame({"cell": pd.array(
            [None if np.isnan(c) else int(c) for c in cell], dtype="Int64"
        ), "cent_sim": sim})

    return cell_sim_kernel


def assign_ivf_cells(
    embeddings: DataFrame,
    dim: int = 64,
    n_centroids: int = 64,
    sample_size: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Partition the corpus into spherical-k-means Voronoi cells:
    (id, vector, cell, cent_sim) with ``cell`` the nearest centroid id and
    ``cent_sim`` the cosine to it. Degenerate vectors (null / mis-sized /
    zero-norm / non-finite) get NULL cell — they have no direction to
    cluster by. One Arrow matmul pass over the corpus; the centroid matrix
    is baked into the kernel closure (no broadcast variable)."""
    C = centroids if centroids is not None else train_ivf_centroids(
        embeddings, dim, n_centroids, sample_size, 10, seed, id_col, vec_col
    )
    kern = _make_cell_sim_kernel(C)
    return embeddings.select(
        F.col(id_col), F.col(vec_col), kern(F.col(vec_col)).alias("_cs")
    ).select(id_col, vec_col, "_cs.cell", "_cs.cent_sim")


def semantic_dup_pairs(
    embeddings: DataFrame,
    tau: float = 0.9,
    dim: int = 64,
    n_centroids: int = 64,
    sample_size: int = 4096,
    seed: int = 42,
    max_block_size: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup-style candidate generation (Abbas et al. 2023, "SemDeDup:
    data-efficient learning at web-scale through semantic deduplication" —
    public paper): near-duplicate pairs are searched WITHIN k-means cells
    only, never across. Exact cosine (Arrow kernel) then applies ``tau``,
    so precision vs the exact pair set is 1.0 and only boundary pairs
    (neighbors split across adjacent cells) cost recall — measured against
    ``cosine_dup_pairs`` in tests.

    Scale shape: one matmul pass assigns cells; the self-join fans out per
    cell, and cells are salted to ``max_block_size`` with the engine's
    standard rank/hash salt (a dense cell — e.g. a boilerplate embedding
    mode — must not go quadratic; the overflow is observable via
    ``oversized_blocks`` like every other salted block). Grow
    ``n_centroids ~ sqrt(corpus)`` so expected cell size stays flat.
    """
    from translink.blocking import with_salt
    from translink.config import LinkConfig

    cells = assign_ivf_cells(
        embeddings, dim, n_centroids, sample_size, seed, id_col, vec_col,
        centroids,
    ).filter(F.col("cell").isNotNull())
    cfg = LinkConfig(max_block_size=max_block_size, salt_mode="hash")
    salted = with_salt(cells, ["cell"], cfg, id_col=id_col).select(
        F.col(id_col), F.col(vec_col), "cell", "salt"
    )
    a = salted.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("_va"),
        "cell", "salt",
    )
    b = salted.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("_vb"),
        "cell", "salt",
    )
    return (
        a.hint("MERGE").join(b, ["cell", "salt"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn("cosine", _cosine_kernel(F.col("_va"), F.col("_vb")))
        .filter(
            F.col("cosine").isNotNull()
            & ~F.isnan("cosine")
            & (F.col("cosine") >= F.lit(float(tau)))
        )
        .select("vec_id_a", "vec_id_b", "cosine")
    )


def semantic_dedup_keep(
    embeddings: DataFrame,
    tau: float = 0.9,
    dim: int = 64,
    n_centroids: int = 64,
    sample_size: int = 4096,
    seed: int = 42,
    max_block_size: int = 256,
    keep_policy: str = "farthest",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup end-to-end verdict: within-cell threshold pairs resolved
    into components (the engine's large-star/small-star CC), one keeper
    elected per component. Returns every corpus id:
    ``(vec_id, cluster_id, cent_sim, keep)``.

    ``keep_policy``:
      - ``'farthest'`` (SemDeDup's rule): keep the member with the LOWEST
        cosine to its cell centroid — of a group of semantic duplicates,
        the most atypical example preserves the most diversity. Min-id
        tie-break.
      - ``'min_id'``: deterministic baseline (matches ``doc_dedup_keep``).

    Vectors that never pair (singletons, plus degenerate vectors with no
    direction) are their own cluster and always kept.

    The quantizer trains ONCE (one bounded-sample collect); the cell
    kernel then appears in two plan subtrees (pair generation and the
    keeper election's cent_sim lookup) — both are map-side matmul passes
    with no shuffle, so the duplication costs one extra corpus scan, not
    an exchange; persist the ``assign_ivf_cells`` frame to trade memory
    for that scan if embeddings are the dominant input.
    """
    from translink.clustering import (
        clusters_with_singletons, connected_components,
    )

    C = train_ivf_centroids(
        embeddings, dim, n_centroids, sample_size, 10, seed, id_col, vec_col
    )
    cells = assign_ivf_cells(
        embeddings, dim, n_centroids, sample_size, seed, id_col, vec_col, C
    )
    pairs = semantic_dup_pairs(
        embeddings, tau, dim, n_centroids, sample_size, seed,
        max_block_size, id_col, vec_col, centroids=C,
    )
    edges = pairs.select(
        F.col("vec_id_a").alias("src"), F.col("vec_id_b").alias("dst")
    )
    comp = connected_components(edges)
    labeled = clusters_with_singletons(
        embeddings.select(F.col(id_col).alias("conv_id")), comp
    ).select(F.col("conv_id").alias(id_col), "cluster_id")
    member = labeled.join(cells.select(id_col, "cent_sim"), id_col, "left")
    if keep_policy == "farthest":
        order = [F.col("cent_sim").asc_nulls_last(), F.col(id_col).asc()]
    elif keep_policy == "min_id":
        order = [F.col(id_col).asc()]
    else:
        raise ValueError(
            f"unknown keep_policy {keep_policy!r} (want 'farthest' or 'min_id')"
        )
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return (
        member.withColumn("keep", F.row_number().over(w) == 1)
        .select(id_col, "cluster_id", "cent_sim", "keep")
    )


def knn_label_vote(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority label per query (ties -> smallest label). A one-line
    consumer of the exact top-k — the shape of a dataset-curation dedup/
    labeling job."""
    topk = cosine_topk(embeddings, queries, k, id_col, vec_col)
    labeled = topk.join(
        embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(label_col)),
        "neighbor_id",
    )
    counts = labeled.groupBy("query_id", label_col).agg(F.count("*").alias("votes"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col(label_col).asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col(label_col).alias("predicted_label"), "votes")
    )
