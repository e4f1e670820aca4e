"""Stage 1 — per-conversation signatures.

The reference enriches records with progressively stronger signatures
(sampled rolling checksum -> SimHash/fingerprint -> full Blake3; reference
``src/pipeline/streaming_quickcheck.rs:162-177``,
``src/pipeline/streaming_statistical.rs:183-224``, ``src/pipeline/hash.rs:24-43``).
Our equivalents, all JVM-side:

  - exact digests: ``xxhash64(canon_text)`` (fast path) + ``md5`` (portable,
    cross-engine-checkable) — analog of the full Blake3 checksum.
  - MinHash signature: word n-gram shingles -> per-seed min of
    ``xxhash64(shingle, seed)`` — replaces the reference's SimHash (H8/H9)
    with the standard MinHash construction whose collision probability equals
    Jaccard similarity, which is what LSH blocking needs.

Everything is a single ``select`` over the canonical table: no shuffle, no
Python. MinHash cost is O(num_hashes x shingles) hash evaluations inside
whole-stage codegen; shingle count is bounded because canon_text is capped at
canonicalization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from translink.config import LinkConfig

#: Tokenization used for shingling and token-Jaccard scoring: split on any
#: non-alphanumeric run, drop empties, lowercase. Deterministic and cheap.
TOKENIZE_PATTERN = "[^a-zA-Z0-9]+"


def tokens_expr(col: str = "canon_text"):
    """Distinct lowercase word tokens of a text column (JVM expression)."""
    return F.array_remove(
        F.array_distinct(F.split(F.lower(F.col(col)), TOKENIZE_PATTERN)), ""
    )


def shingles_expr(col: str = "canon_text", n: int = 3):
    """Word n-gram shingle array of a text column (JVM expression).

    Keeps duplicates out (distinct) so MinHash estimates set-Jaccard. For
    texts shorter than ``n`` tokens the whole token sequence is one shingle.
    """
    toks = f"array_remove(split(lower({col}), '{TOKENIZE_PATTERN}'), '')"
    return F.expr(
        f"array_remove(array_distinct(case when size({toks}) <= {n} "
        f"then array(array_join({toks}, ' ')) "
        f"else transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' ')) end), '')"
    )


def with_exact_digest(canonical: DataFrame) -> DataFrame:
    """Add exact-duplicate digests of the canonical text.

    ``digest``     — xxhash64, 64-bit, the grouping key for the exact path
                     (analog of Blake3 full checksum, reference
                     src/pipeline/hash.rs:24-43; xxhash64 because it is
                     JVM-native and codegen-friendly).
    ``digest_md5`` — md5 hex, portable across engines; also the analog of the
                     16-byte Blake3 fingerprint
                     (src/pipeline/streaming_statistical.rs:215-224).
    """
    return canonical.withColumns({
        "digest": F.xxhash64("canon_text"),
        "digest_md5": F.md5("canon_text"),
    })


def make_signature_udf(k: int, n: int, seed: int = 42):
    """Arrow-batched signature kernel: token-hash array -> (shingle_hashes,
    minhash), fully vectorized across the batch.

    Avoids materializing shingle STRINGS entirely (building them with
    slice+array_join higher-order expressions is interpreted JVM work and
    dominates the signature stage ~30:1). Instead each word n-gram is hashed
    numerically: s_i = C1*h_i + C2*h_{i+1} + ... (wrapped int64, odd
    constants — injective per position whp), deduplicated per row, then the
    k-permutation multiply-shift MinHash runs over the deduped shingle-hash
    sets. Rows with fewer than n tokens contribute one truncated shingle
    (same semantics as shingles_expr); empty rows get sentinel [0]*k.
    """
    rng = np.random.default_rng(seed ^ 0x5EED)
    C = ((rng.integers(1, 1 << 62, size=n).astype(np.int64)) << np.int64(1)) | np.int64(1)
    rng2 = np.random.default_rng(seed)
    A = ((rng2.integers(1, 1 << 62, size=k).astype(np.int64)) << np.int64(1)) | np.int64(1)
    B = rng2.integers(0, 1 << 62, size=k).astype(np.int64)

    from pyspark.sql.types import StructField, StructType

    out_type = StructType([
        StructField("shingle_hashes", ArrayType(LongType()), False),
        StructField("minhash", ArrayType(LongType()), False),
    ])

    @pandas_udf(out_type)
    def signature_kernel(col: pd.Series) -> pd.DataFrame:
        sh_out: list = []
        rows_sh: list = []
        for a in col:
            h = np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64)
            if len(h) == 0:
                rows_sh.append(np.empty(0, np.int64))
                continue
            if len(h) <= n:
                s = np.array([int((C[: len(h)] * h).sum(dtype=np.int64))], dtype=np.int64)
            else:
                m = len(h) - n + 1
                s = np.zeros(m, dtype=np.int64)
                for j in range(n):
                    s += C[j] * h[j: j + m]
            rows_sh.append(np.unique(s))
        lens = np.array([len(s) for s in rows_sh], dtype=np.int64)
        nonempty = lens > 0
        mh = np.zeros((len(rows_sh), k), dtype=np.int64)
        if nonempty.any():
            H = np.concatenate([s for s in rows_sh if len(s)])
            ne_lens = lens[nonempty]
            starts = np.zeros(len(ne_lens), dtype=np.int64)
            np.cumsum(ne_lens[:-1], out=starts[1:])
            sub = np.empty((len(ne_lens), k), dtype=np.int64)
            for i in range(k):
                sub[:, i] = np.minimum.reduceat(A[i] * H + B[i], starts)
            mh[nonempty] = sub
        return pd.DataFrame({
            "shingle_hashes": [s.tolist() for s in rows_sh],
            "minhash": list(mh),
        })

    return signature_kernel


def make_minhash_udf(k: int, seed: int = 42):
    """Arrow-batched MinHash kernel: k multiply-shift permutations of the
    pre-hashed shingle array, min per permutation, fully vectorized in numpy
    across the batch (one reduceat pass per permutation).

    Why a pandas UDF and not pure SQL expressions: the expression form
    (transform(sequence(k), i -> array_min(transform(hashes, h -> ...))))
    nests higher-order lambdas, which Spark evaluates interpreted — outside
    whole-stage codegen — at ~100x the cost of this numpy kernel. This is
    exactly the "built-ins genuinely can't express it efficiently" case the
    Arrow path exists for.

    (a*h + b) with odd ``a`` wraps mod 2^64 — a bijective scramble of the
    hash space per permutation, the standard multiply-shift MinHash family.
    Empty shingle sets get the constant sentinel signature [0]*k.
    """
    rng = np.random.default_rng(seed)
    A = ((rng.integers(1, 1 << 62, size=k).astype(np.int64)) << np.int64(1)) | np.int64(1)
    B = rng.integers(0, 1 << 62, size=k).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def minhash_kernel(col: pd.Series) -> pd.Series:
        arrs = [
            np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64)
            for a in col
        ]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        nonempty = lens > 0
        out = np.zeros((len(arrs), k), dtype=np.int64)  # sentinel rows
        if nonempty.any():
            H = np.concatenate([a for a in arrs if len(a)])
            ne_lens = lens[nonempty]
            starts = np.zeros(len(ne_lens), dtype=np.int64)
            np.cumsum(ne_lens[:-1], out=starts[1:])
            sub = np.empty((len(ne_lens), k), dtype=np.int64)
            for i in range(k):
                sub[:, i] = np.minimum.reduceat(A[i] * H + B[i], starts)
            out[nonempty] = sub
        return pd.Series(list(out))

    return minhash_kernel


def with_minhash(
    canonical: DataFrame,
    cfg: LinkConfig | None = None,
    repartition: int | None = None,
    method: str = "arrow",
) -> DataFrame:
    """Add ``shingle_hashes: array<bigint>`` (each shingle xxhash64'd once)
    and ``minhash: array<bigint>`` signature columns.

    ``method='arrow'`` (default): numpy kernel per Arrow batch
    (make_minhash_udf). ``method='expr'``: pure-SQL nested higher-order
    expression — same semantics family, JVM-only, but interpreted (no
    codegen for nested lambdas), kept for environments where Arrow is
    unavailable.

    ``repartition``: MinHash is CPU-heavy but byte-light; upstream AQE
    coalescing (or a single small parquet file) can leave it on 1-2
    partitions. Pass the session's parallelism to force even spread — at any
    scale, signature cost is per-row, so partition count should track cores,
    not bytes.
    """
    cfg = cfg or LinkConfig()
    if repartition:
        canonical = canonical.repartition(repartition)
    k = cfg.num_hashes
    if method == "arrow":
        # token hashing stays JVM-side (one flat transform — cheap); shingle
        # construction + dedup + k-permutation minhash run in one numpy
        # kernel per Arrow batch (no shingle strings ever materialize)
        token_hashes = F.expr(
            f"transform(array_remove(split(lower(canon_text), "
            f"'{TOKENIZE_PATTERN}'), ''), t -> xxhash64(t))"
        )
        sig = make_signature_udf(k, cfg.shingle_size)
        return (
            canonical
            .withColumn("_sig", sig(token_hashes))
            .withColumn("shingle_hashes", F.col("_sig.shingle_hashes"))
            .withColumn("minhash", F.col("_sig.minhash"))
            .drop("_sig")
        )
    base = (
        canonical
        .withColumn("_shingles", shingles_expr("canon_text", cfg.shingle_size))
        # each shingle string is hashed ONCE; everything downstream (minhash
        # family, exact-jaccard verification) works on compact long arrays
        .withColumn("shingle_hashes", F.expr("transform(_shingles, s -> xxhash64(s))"))
        .drop("_shingles")
    )
    expr = (
        f"case when size(shingle_hashes) = 0 "
        f"then transform(sequence(0, {k - 1}), i -> cast(0 as bigint)) "
        f"else transform(sequence(0, {k - 1}), "
        f"i -> array_min(transform(shingle_hashes, h -> xxhash64(h, i)))) end"
    )
    return base.withColumn("minhash", F.expr(expr))


def minhash_jaccard_expr(a: str = "a.minhash", b: str = "b.minhash"):
    """Estimated Jaccard similarity from two MinHash signatures: fraction of
    agreeing components. JVM expression; used to pre-filter LSH candidates."""
    return F.expr(
        f"size(filter(zip_with({a}, {b}, (x, y) -> x = y), v -> v)) / size({a})"
    )
