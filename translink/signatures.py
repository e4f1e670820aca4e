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

from pyspark.sql import DataFrame, functions as F

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


def with_minhash(canonical: DataFrame, cfg: LinkConfig | None = None) -> DataFrame:
    """Add a ``minhash: array<bigint>`` signature column.

    Construction: for seed i in [0, num_hashes): min over shingles s of
    ``xxhash64(s, i)``. Hashing the (shingle, seed) pair gives an independent
    hash family without modular arithmetic (which would trip ANSI overflow
    checks). Empty shingle sets get a constant sentinel signature so empty
    conversations only ever match each other.
    """
    cfg = cfg or LinkConfig()
    k = cfg.num_hashes
    expr = (
        f"case when size(_shingles) = 0 then transform(sequence(0, {k - 1}), i -> cast(0 as bigint)) "
        f"else transform(sequence(0, {k - 1}), "
        f"i -> array_min(transform(_shingles, s -> xxhash64(s, i)))) end"
    )
    return (
        canonical
        .withColumn("_shingles", shingles_expr("canon_text", cfg.shingle_size))
        .withColumn("minhash", F.expr(expr))
        .drop("_shingles")
    )


def minhash_jaccard_expr(a: str = "a.minhash", b: str = "b.minhash"):
    """Estimated Jaccard similarity from two MinHash signatures: fraction of
    agreeing components. JVM expression; used to pre-filter LSH candidates."""
    return F.expr(
        f"size(filter(zip_with({a}, {b}, (x, y) -> x = y), v -> v)) / size({a})"
    )
