"""Document-corpus operators — the training-data-pipeline suite.

The same cascade the engine applies to conversations, applied to a flat
``documents(doc_id, text, lang, source, n_chars)`` corpus, plus the text
analysis a large-scale dataset pipeline needs: exact dedup, shingle-Jaccard
near-dup, MinHash-LSH near-dup, SimHash, language-ID, quality scoring, token
stats, fingerprints. Everything JVM-side except the SimHash kernel (Arrow
pandas UDF, no per-row Python crossings).

These mirror the reference's content-analysis kernels: structure analysis
H5 (``src/pipeline/quick_check.rs:333-370``) -> quality ratios; SimHash H8/H9
(``src/pipeline/stats.rs:362-389``) -> ``doc_simhash``; Blake3 fingerprint
H10 -> ``doc_fingerprint``; hash-and-group A1-A5 -> the dedup functions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from translink.blocking import with_salt
from translink.config import LinkConfig
from translink.signatures import shingles_expr, with_minhash

_ID = "doc_id"


#: ASCII word-separator class for the document-STATS family (langid,
#: quality, token stats, repetition, passages, top-ngrams): deliberately
#: DISTINCT from the linkage engine's TOKENIZE_PATTERN (signatures.py),
#: which treats non-ASCII as token material — these operators measure
#: ASCII word statistics and their DuckDB oracles encode this same class.
_ASCII_SEP = "[^a-zA-Z0-9]+"


def _ascii_tokens(col=None):
    """Lowercase ASCII word tokens of ``col`` (default: null-coalesced
    ``text``) — the ONE tokenizer expression for the doc-stats family, so
    a change cannot silently diverge the six operators that share it."""
    c = F.coalesce("text", F.lit("")) if col is None else col
    return F.array_remove(F.split(F.lower(c), _ASCII_SEP), "")


def _parallelism(df: DataFrame) -> int:
    """Session shuffle parallelism — the right partition count for CPU-bound
    signature stages (byte-based AQE coalescing or a single small input file
    would otherwise serialize them)."""
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


# -- exact dedup (A1+A5 hash-and-group) ------------------------------------

def doc_exact_dup_clusters(docs: DataFrame) -> DataFrame:
    """Byte-identical documents -> (doc_id, cluster_id, group_size).

    The window partitions on BOTH digests of the text (xxhash64 + md5, the
    same both-digest complementarity discipline as the conversation path,
    translink/clustering.py) rather than on the raw text: the shuffle then
    moves ~40 bytes of key per row instead of whole documents, and a pair
    would have to collide on two independent hash families simultaneously
    to merge wrongly. Null text keeps its own group (md5(NULL) is NULL,
    distinct from md5(''))."""
    w = Window.partitionBy(F.xxhash64("text"), F.md5("text"))
    return (
        docs.select(
            _ID,
            F.min(_ID).over(w).alias("cluster_id"),
            F.count("*").over(w).alias("group_size"),
        )
        .filter(F.col("group_size") >= 2)
    )


# -- shingle-Jaccard near-dup (blocked, salted, exact verification) --------

def doc_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    length_bucket: int = 64,
    max_block_size: int = 64,
    salt_mode: str = "rank",
    method: str = "arrow",
) -> DataFrame:
    """Near-duplicate pairs by word n-gram Jaccard within (lang, length)
    blocks. The brute-force baseline the LSH path is validated against.

    ``method='arrow'`` (default): shingles are 64-bit hashes from the Arrow
    kernel (translink.signatures.make_shingle_udf) — Jaccard values are
    identical modulo negligible hash collisions, at ~15x the throughput of
    the interpreted nested-HOF expression. ``method='expr'``: string
    shingles via ``shingles_expr`` — fully ANSI-SQL-reproducible, kept for
    the DuckDB oracle variant."""
    cfg = LinkConfig(max_block_size=max_block_size, salt_mode=salt_mode)
    if method == "arrow":
        from translink.signatures import make_shingle_udf

        sh = make_shingle_udf(shingle_n)(F.coalesce("text", F.lit("")))
    elif method == "expr":
        sh = shingles_expr("coalesce(text, '')", shingle_n)
    else:
        # a typo must not silently fall through to the ~15x-slower
        # interpreted path (siblings doc_containment_pairs/doc_decontaminate
        # already raise)
        raise ValueError(f"unknown method {method!r}; use 'arrow' or 'expr'")
    blocked = docs.repartition(_parallelism(docs)).select(
        _ID,
        F.concat_ws(
            "|",
            F.coalesce("lang", F.lit("")),
            F.floor(F.length(F.coalesce("text", F.lit(""))) / length_bucket)
            .cast("string"),
        ).alias("block_key"),
        sh.alias("shingles"),
    )
    salted = with_salt(blocked, ["block_key"], cfg, id_col=_ID)
    left = salted.select(_ID, "block_key", "salt", "shingles")
    pairs = (
        left.alias("a")
        .hint("MERGE")
        .join(
            left.alias("b"),
            on=[
                F.col("a.block_key") == F.col("b.block_key"),
                F.col("a.salt") == F.col("b.salt"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            (
                F.when(
                    F.size(F.array_union("a.shingles", "b.shingles")) == 0, F.lit(0.0)
                ).otherwise(
                    F.size(F.array_intersect("a.shingles", "b.shingles"))
                    / F.size(F.array_union("a.shingles", "b.shingles"))
                )
            ).alias("jaccard"),
        )
    )
    return pairs.filter(F.col("jaccard") >= threshold)


# -- shingle containment (sub-document duplication) ------------------------

def doc_containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    shingle_n: int = 3,
    df_cap: int = 64,
    method: str = "arrow",
) -> DataFrame:
    """Directed shingle-containment pairs: ``|A ∩ B| / |A|`` (and the
    ``/ |B|`` direction), keeping pairs where EITHER direction clears
    ``threshold``. Catches sub-document duplication — a short document
    quoted inside a long one — which symmetric Jaccard misses (the long
    side's extra shingles dilute the union), and which the Jaccard
    operator's length-bucket blocking cannot even pair up.

    Two phases, both corpus-scale shapes:

    1. CANDIDATES from an inverted shingle index with a document-frequency
       cap: grams appearing in more than ``df_cap`` documents are dropped
       from candidate generation (standard frequency filtering — a pair
       sharing only ubiquitous grams is not a containment candidate, and
       the cap bounds the index self-join's per-gram fan-out at ANY corpus
       size).
    2. VERIFY: shingle arrays join onto the deduplicated candidate id
       pairs and the intersection is computed exactly — payloads ship only
       for candidates, the same verify pattern as the MinHash path.

    Output: (doc_id_a, doc_id_b, containment_a_in_b, containment_b_in_a)
    with doc_id_a < doc_id_b. Documents with no shingles (empty text)
    never pair. ``method='arrow'`` hashes grams to 64 bits (8-byte index
    keys); ``method='expr'`` keeps gram strings, ANSI-reproducible for the
    DuckDB oracle.
    """
    if method == "arrow":
        from translink.signatures import make_shingle_udf

        sh = make_shingle_udf(shingle_n)(F.coalesce("text", F.lit("")))
    elif method == "expr":
        sh = shingles_expr("coalesce(text, '')", shingle_n)
    else:
        raise ValueError(f"unknown method {method!r} (want 'arrow' or 'expr')")

    shingled = docs.repartition(_parallelism(docs)).select(
        _ID, sh.alias("shingles")
    ).filter(F.size("shingles") > 0)
    grams = shingled.select(_ID, F.explode("shingles").alias("gram"))
    rare = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= F.lit(int(df_cap)))
        .select("gram")
    )
    indexed = grams.join(rare, "gram")
    cand = (
        indexed.select(F.col(_ID).alias("doc_id_a"), "gram")
        .join(indexed.select(F.col(_ID).alias("doc_id_b"), "gram"), "gram")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )
    sets = shingled.select(_ID, "shingles")
    scored = (
        cand
        .join(sets.select(F.col(_ID).alias("doc_id_a"),
                          F.col("shingles").alias("_sa")), "doc_id_a")
        .join(sets.select(F.col(_ID).alias("doc_id_b"),
                          F.col("shingles").alias("_sb")), "doc_id_b")
        .select(
            "doc_id_a", "doc_id_b",
            (F.size(F.array_intersect("_sa", "_sb"))
             / F.size("_sa")).alias("containment_a_in_b"),
            (F.size(F.array_intersect("_sa", "_sb"))
             / F.size("_sb")).alias("containment_b_in_a"),
        )
    )
    return scored.filter(
        F.greatest("containment_a_in_b", "containment_b_in_a")
        >= F.lit(float(threshold))
    )


# -- benchmark decontamination ---------------------------------------------

def doc_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 8,
    min_matches: int = 1,
    method: str = "arrow",
) -> DataFrame:
    """Flag training documents that overlap a benchmark/eval corpus — the
    n-gram-overlap decontamination rule standard for LLM training data,
    plus an exact-text check for documents too short to carry a full
    n-gram. Returns one row per ``docs`` row:
    (doc_id, matched_ngrams, exact_match, contaminated).

    Scale shape (100 TB corpus vs MB-scale benchmark): the benchmark side
    is shingled once and distinct-reduced before the join; the corpus side
    streams through one shingle pass and an equi-join on the gram key. With
    ``method='arrow'`` (default) grams are 64-bit hashes from the
    vectorized shingle kernel (translink/signatures.py:make_shingle_udf) —
    8-byte exchange keys, no text on the wire; ``method='expr'`` joins on
    the literal gram string (ANSI-reproducible, the DuckDB-oracle path).
    No broadcast (north rule): the sort-merge join's benchmark side is
    trivially small, and a stop-phrase gram shared by many training docs
    fans out only into the per-doc count aggregate (AQE skew-split bounds
    the join partitions).
    """
    if method == "arrow":
        from translink.signatures import make_shingle_udf

        kern = make_shingle_udf(shingle_n)
        sh_docs = kern(F.coalesce("text", F.lit("")))
        sh_bench = kern(F.coalesce("text", F.lit("")))
    elif method == "expr":
        sh_docs = shingles_expr("coalesce(text, '')", shingle_n)
        sh_bench = shingles_expr("coalesce(text, '')", shingle_n)
    else:
        raise ValueError(f"unknown method {method!r} (want 'arrow' or 'expr')")

    doc_grams = docs.repartition(_parallelism(docs)).select(
        _ID, F.explode(sh_docs).alias("gram")
    )
    bench_grams = benchmark.select(F.explode(sh_bench).alias("gram")).distinct()
    # shingle arrays are distinct per doc and the benchmark side is
    # distinct-reduced, so count(*) == number of DISTINCT grams matched
    hits = (
        doc_grams.join(bench_grams, "gram")
        .groupBy(_ID)
        .agg(F.count("*").alias("_m"))
    )
    bench_digests = benchmark.select(
        F.md5(F.coalesce("text", F.lit(""))).alias("_bd")
    ).distinct()
    return (
        docs.select(_ID, F.md5(F.coalesce("text", F.lit(""))).alias("_d"))
        .join(hits, _ID, "left")
        .join(bench_digests, F.col("_d") == F.col("_bd"), "left")
        .select(
            _ID,
            F.coalesce("_m", F.lit(0)).cast("long").alias("matched_ngrams"),
            F.col("_bd").isNotNull().alias("exact_match"),
            (
                (F.coalesce("_m", F.lit(0)) >= F.lit(int(min_matches)))
                | F.col("_bd").isNotNull()
            ).alias("contaminated"),
        )
    )


def doc_decontaminated_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 8,
    min_matches: int = 1,
    method: str = "arrow",
) -> DataFrame:
    """The clean corpus: ``docs`` minus every document
    ``doc_decontaminate`` flags. Anti-join on doc_id, so document payloads
    never shuffle — only ids move."""
    flagged = doc_decontaminate(
        docs, benchmark, shingle_n, min_matches, method
    ).filter(F.col("contaminated")).select(_ID)
    return docs.join(flagged, _ID, "left_anti")


# -- MinHash-LSH near-dup (the scale path) ---------------------------------

def doc_minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """Candidate pairs by MinHash-LSH banding, verified with exact shingle
    Jaccard. Sub-quadratic: the self-join runs on (band_id, band_hash)
    buckets, never on length blocks. Spark-only (hash-family not
    reproducible in ANSI SQL); parity with doc_jaccard_pairs is asserted in
    tests."""
    cfg = cfg or LinkConfig()
    named = docs.select(
        F.col(_ID).alias("conv_id"),
        F.coalesce("text", F.lit("")).alias("canon_text"),
    )
    signed = with_minhash(named, cfg, repartition=_parallelism(docs))
    from translink.blocking import band_hashes_expr

    b, r = cfg.lsh_bands, cfg.lsh_rows
    bands = signed.select(
        "conv_id",
        F.posexplode(band_hashes_expr(b, r)).alias("band_id", "band_hash"),
    )
    salted = with_salt(bands, ["band_id", "band_hash"], cfg)
    left = salted.select("conv_id", "band_id", "band_hash", "salt")
    cand = (
        left.alias("a")
        .hint("MERGE")
        .join(
            left.alias("b"),
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.salt") == F.col("b.salt"),
                F.col("a.conv_id") < F.col("b.conv_id"),
            ],
        )
        .select(
            F.col("a.conv_id").alias("doc_id_a"),
            F.col("b.conv_id").alias("doc_id_b"),
        )
        .distinct()
    )
    # verification jaccard runs on hashed shingles (long arrays) — equal to
    # string-shingle jaccard modulo negligible 64-bit hash collisions
    sh = signed.select(F.col("conv_id"), F.col("shingle_hashes").alias("shingles"))
    verified = (
        cand
        .join(
            sh.select(F.col("conv_id").alias("doc_id_a"), F.col("shingles").alias("sh_a")),
            "doc_id_a",
        )
        .join(
            sh.select(F.col("conv_id").alias("doc_id_b"), F.col("shingles").alias("sh_b")),
            "doc_id_b",
        )
        .select(
            "doc_id_a", "doc_id_b",
            F.when(F.size(F.array_union("sh_a", "sh_b")) == 0, F.lit(0.0))
            .otherwise(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


# -- SimHash (H8/H9 analog; Arrow kernel + banded Hamming pairs) -----------

@pandas_udf(LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens — per-bit +-1 votes by token hash,
    sign -> bit (the reference's construction,
    src/pipeline/streaming_statistical.rs:183-213).

    Fully vectorized (no per-row/per-bit Python): tokenize with C regex,
    hash every token of the Arrow batch in ONE ``pd.util.hash_array`` pass
    (deterministic fixed-key siphash), then count votes with 64 segmented
    1D ``np.add.reduceat`` passes over the (cache-resident) hash array —
    one per bit. Measured ~17x the md5-per-token bit-loop it replaces and
    ~40x a bit-matrix formulation whose (tokens, 64) int32 matrix blows the
    cache (see PLANS.md). Identical semantics: votes count token
    multiplicity; empty text -> sentinel 0.
    """
    import re

    import numpy as np

    pat = re.compile(_ASCII_SEP)  # same class as the doc-stats family
    tok_lists = [
        [t for t in pat.split((text or "").lower()) if t] for text in texts
    ]
    n_rows = len(tok_lists)
    tlens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n_rows)
    out = np.zeros(n_rows, dtype=np.int64)
    nonempty = tlens > 0
    if nonempty.any():
        flat = np.empty(int(tlens.sum()), dtype=object)
        pos = 0
        for toks in tok_lists:
            flat[pos: pos + len(toks)] = toks
            pos += len(toks)
        th = pd.util.hash_array(flat)  # uint64, one C pass for the batch
        ne_lens = tlens[nonempty]
        starts = np.zeros(len(ne_lens), dtype=np.int64)
        np.cumsum(ne_lens[:-1], out=starts[1:])
        # per-bit segmented vote counts: 64 contiguous 1D reductions over
        # the hash array (which stays L2/L3-resident), instead of one
        # reduction over a (tokens, 64) bit matrix that thrashes the cache
        ones = np.empty((64, len(ne_lens)), dtype=np.int64)
        for j in range(64):
            bit_j = ((th >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            ones[j] = np.add.reduceat(bit_j, starts)
        votes = 2 * ones.T - ne_lens[:, None]              # +1 per 1, -1 per 0
        packed = np.packbits(
            (votes > 0).astype(np.uint8), axis=1, bitorder="little"
        )
        out[nonempty] = np.ascontiguousarray(packed).view(np.uint64).ravel().view(np.int64)
    return pd.Series(out, dtype="int64")


def doc_simhash(docs: DataFrame) -> DataFrame:
    return docs.select(_ID, simhash64_udf(F.col("text")).alias("simhash"))


def doc_simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    cfg: LinkConfig | None = None,
    chunk_cap: int = 4096,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= ``max_hamming``.

    Banding: the 64-bit hash splits into 4 x 16-bit chunks; by pigeonhole any
    pair within Hamming distance 3 shares at least one exact chunk, so the
    join runs on chunk buckets and the full Hamming distance verifies.
    EXACT for max_hamming <= 3 only while no (chunk_id, chunk) bucket
    exceeds ``chunk_cap``; approximate (banding recall) above Hamming 3.

    Skew guard (P8, same discipline as every other blocking join in the
    engine): (1) rows with the empty-text sentinel ``simhash == 0`` are
    routed OFF this path entirely — byte-identical empty/near-empty docs
    belong to ``doc_exact_dup_clusters``, and leaving them here plants one
    n^2 hot bucket that collides on ALL FOUR chunks (the reference bounds
    every grouping stage the same way, src/pipeline/streaming_hash.rs:132-202);
    (2) the chunk keys are salted so no single bucket joins more than
    ``chunk_cap`` rows per sub-block. Pairs across salt sub-blocks of an
    oversized bucket are sacrificed — observable via
    translink.blocking.oversized_blocks.

    Sizing ``chunk_cap``: chunk values are 16-bit, so a RANDOM corpus fills
    buckets at ~n/65536 rows each — with the default 4096 the join stays
    exact to ~270M documents per partition-disjoint corpus slice while the
    worst-case hot bucket is bounded at ~chunk_cap^2/2 pairs. The tight
    pipeline-wide ``cfg.max_block_size`` (default 64, right for text-keyed
    blocks whose buckets are duplicate-driven) would split EVERY bucket at
    a few million docs and sacrifice most true pairs — hence the separate
    knob. Raise it (or pre-partition the corpus) when a deployment's scale
    pushes average buckets past the cap."""
    cfg = cfg or LinkConfig()
    if cfg.max_block_size > chunk_cap:
        chunk_cap = cfg.max_block_size
    from dataclasses import replace as _dc_replace

    salt_cfg = _dc_replace(cfg, max_block_size=int(chunk_cap))
    sh = doc_simhash(docs).filter(F.col("simhash") != 0)
    chunks = sh.select(
        _ID, "simhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), i -> cast(shiftright(simhash, i * 16) & 65535 as int))"
            )
        ).alias("chunk_id", "chunk"),
    )
    salted = with_salt(chunks, ["chunk_id", "chunk"], salt_cfg, id_col=_ID).select(
        _ID, "simhash", "chunk_id", "chunk", "salt"
    )
    cand = (
        salted.alias("a")
        .join(
            salted.alias("b"),
            on=[
                F.col("a.chunk_id") == F.col("b.chunk_id"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.salt") == F.col("b.salt"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )


# -- entropy + character-class histogram (H6/H7) ---------------------------

_ENTROPY_FIELDS = [
    ("n_chars_measured", "long"), ("n_lower", "long"), ("n_upper", "long"),
    ("n_digit", "long"), ("n_space", "long"), ("n_punct", "long"),
    ("n_other", "long"), ("entropy_bits", "double"),
]


def _entropy_struct_type():
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    return StructType([
        StructField(name, LongType() if t == "long" else DoubleType())
        for name, t in _ENTROPY_FIELDS
    ])


@pandas_udf(_entropy_struct_type())
def _entropy_kernel(texts: pd.Series) -> pd.DataFrame:
    """Per-document char-class histogram + Shannon entropy, fully vectorized
    over the Arrow batch (no per-row Python in the hot loop).

    One UTF-32 decode of the whole batch -> codepoint array + per-row
    offsets; per-(row, codepoint) counts come from a single ``np.unique``
    over the combined key ``row_idx << 21 | codepoint`` (codepoints fit in
    21 bits), then ``Σ c·log2(c)`` folds back per row with ``np.bincount``.
    The key sort inside ``np.unique`` yields (row, codepoint)-ascending
    count order — the identical summation order as the expression form's
    char-sorted fold, so values agree to float ulp. Class counts are
    bincounts of masked row indices. Empty/null text -> zeros + entropy 0.
    """
    import numpy as np

    n_rows = len(texts)
    filled = ["" if t is None else t for t in texts]
    lens = np.fromiter((len(t) for t in filled), dtype=np.int64, count=n_rows)
    cols = {name: np.zeros(n_rows, dtype=np.int64) for name, t in _ENTROPY_FIELDS[:-1]}
    ent = np.zeros(n_rows, dtype=np.float64)
    cols["n_chars_measured"] = lens
    total = int(lens.sum())
    if total:
        cp = np.frombuffer("".join(filled).encode("utf-32-le"), dtype=np.uint32)
        row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        # per-(row, char) counts in one C pass
        uk, counts = np.unique((row_idx << np.int64(21)) | cp.astype(np.int64),
                               return_counts=True)
        urow = (uk >> np.int64(21)).astype(np.intp)
        c = counts.astype(np.float64)
        clogc = np.bincount(urow, weights=c * np.log2(c), minlength=n_rows)
        nz = lens > 0
        nf = lens[nz].astype(np.float64)
        ent[nz] = np.round(np.log2(nf) - clogc[nz] / nf, 9)
        # character classes (exact analogs of the regex character classes)
        ridx = row_idx.astype(np.intp)

        def _cnt(mask):
            return np.bincount(ridx[mask], minlength=n_rows).astype(np.int64)

        cols["n_lower"] = _cnt((cp >= 97) & (cp <= 122))
        cols["n_upper"] = _cnt((cp >= 65) & (cp <= 90))
        cols["n_digit"] = _cnt((cp >= 48) & (cp <= 57))
        cols["n_space"] = _cnt((cp == 32) | (cp == 9) | (cp == 10))
        cols["n_punct"] = _cnt(
            ((cp >= 33) & (cp <= 47)) | ((cp >= 58) & (cp <= 64))
            | ((cp >= 91) & (cp <= 96)) | ((cp >= 123) & (cp <= 126))
        )
        cols["n_other"] = (
            lens - cols["n_lower"] - cols["n_upper"] - cols["n_digit"]
            - cols["n_space"] - cols["n_punct"]
        )
    return pd.DataFrame({**cols, "entropy_bits": ent})


def doc_entropy(docs: DataFrame, method: str = "arrow") -> DataFrame:
    """Shannon entropy over the character distribution plus a character-class
    histogram — the reference's statistical quality features (entropy
    ``src/pipeline/stats.rs:353-359``, 256-bucket byte-frequency histogram
    ``:156-183``), standard boilerplate/compression signals for training-data
    curation.

    The histogram is collapsed to 6 character classes (lower/upper/digit/
    space/punct-ascii/other) — exact integer counts. Entropy is computed
    over the full per-character distribution with a DETERMINISTIC summation
    order (counts sorted by character code, left-fold): ``-Σ p·log2(p)`` in
    bits, 0.0 for empty text.

    ``method='arrow'`` (default, the scale path): one Arrow kernel pass per
    batch — zero shuffle, O(corpus chars) map-side work. ``method='expr'``:
    explode + hash-aggregate per character — fully ANSI-SQL-reproducible and
    kept for the DuckDB oracle, but it shuffles one row PER CHARACTER of the
    corpus, which at 100 TB is a corpus-of-characters exchange; never the
    public default. Values agree to float ulp (identical summation order);
    parity is pytest-asserted.
    """
    if method == "arrow":
        stats = docs.repartition(_parallelism(docs)).select(
            _ID, _entropy_kernel(F.col("text")).alias("_s")
        )
        return stats.select(_ID, "_s.*")
    text = F.coalesce("text", F.lit(""))
    n = F.length(text)
    lower_n = F.length(F.regexp_replace(text, "[^a-z]", ""))
    upper_n = F.length(F.regexp_replace(text, "[^A-Z]", ""))
    digit_n = F.length(F.regexp_replace(text, "[^0-9]", ""))
    space_n = F.length(F.regexp_replace(text, "[^ \\t\\n]", ""))
    punct_n = F.length(
        F.regexp_replace(text, "[^!-/:-@\\[-`{-~]", "")
    )
    classes = docs.select(
        _ID,
        n.cast("long").alias("n_chars_measured"),
        lower_n.cast("long").alias("n_lower"),
        upper_n.cast("long").alias("n_upper"),
        digit_n.cast("long").alias("n_digit"),
        space_n.cast("long").alias("n_space"),
        punct_n.cast("long").alias("n_punct"),
        (n - lower_n - upper_n - digit_n - space_n - punct_n)
        .cast("long").alias("n_other"),
    )
    # per-character counts via explode + hash aggregation (codegen, scales
    # with data not with distinct^2), re-assembled per doc as a char-sorted
    # count array so the entropy fold is order-deterministic cross-engine;
    # entropy = log2(n) - (1/n)·Σ c·log2(c) (algebraically -Σ p·log2(p),
    # every log taken on an integer count)
    counts = (
        docs.select(_ID, F.explode(F.split(text, "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy(_ID, "ch")
        .agg(F.count("*").alias("c"))
        .groupBy(_ID)
        .agg(
            F.array_sort(F.collect_list(F.struct("ch", "c"))).alias("_cc"),
            F.sum("c").alias("_n"),
        )
        .select(
            _ID,
            F.round(
                F.log2(F.col("_n").cast("double"))
                - F.expr(
                    "aggregate(_cc, cast(0.0 as double), "
                    "(acc, e) -> acc + cast(e.c as double) * log2(cast(e.c as double)))"
                ) / F.col("_n").cast("double"),
                9,
            ).alias("entropy_bits"),
        )
    )
    return (
        classes.join(counts, _ID, "left")
        .withColumn("entropy_bits", F.coalesce("entropy_bits", F.lit(0.0)))
    )


# -- language ID (n-gram/stopword heuristic) -------------------------------

#: Tiny per-language marker-token profiles (heuristic, deterministic).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "fast", "small", "key"],
    "de": ["der", "und", "die", "das", "nicht", "ist"],
    "es": ["el", "la", "los", "que", "de", "una"],
    "fr": ["le", "les", "des", "une", "est", "dans"],
    "zh": ["de", "shi", "bu", "le", "zai"],
}


def doc_langid(docs: DataFrame) -> DataFrame:
    """Guess language by marker-token hit counts; deterministic tie-break on
    language code. Output: (doc_id, lang_guess, lang_hits)."""
    toks = F.array_distinct(_ascii_tokens())
    df = docs.select(_ID, toks.alias("_toks"))
    hit_cols = []
    for code in sorted(LANG_PROFILES):
        profile = ", ".join(f"'{w}'" for w in LANG_PROFILES[code])
        df = df.withColumn(
            f"_h_{code}", F.size(F.array_intersect("_toks", F.expr(f"array({profile})")))
        )
        hit_cols.append(f"_h_{code}")
    best = F.greatest(*[F.col(c) for c in hit_cols])
    guess = F.lit("und")
    # descending code order so earlier codes win ties via later when() override
    for code in sorted(LANG_PROFILES, reverse=True):
        guess = F.when(F.col(f"_h_{code}") == best, F.lit(code)).otherwise(guess)
    return df.select(
        _ID,
        F.when(best > 0, guess).otherwise(F.lit("und")).alias("lang_guess"),
        best.alias("lang_hits"),
    )


# -- quality scoring (H5 structure-analysis analog) ------------------------

def doc_quality(docs: DataFrame) -> DataFrame:
    """Length/punctuation/digit/stopword ratios + blended quality score.
    All exact integer arithmetic -> deterministic doubles."""
    text = F.coalesce("text", F.lit(""))
    n = F.length(text)
    alnum_sp = F.length(F.regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    digits = F.length(F.regexp_replace(text, "[^0-9]", ""))
    toks = _ascii_tokens(text)
    n_toks = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    safe_n = F.greatest(n, F.lit(1))
    punct_ratio = (n - alnum_sp) / safe_n
    digit_ratio = digits / safe_n
    uniq_ratio = n_uniq / F.greatest(n_toks, F.lit(1))
    score = (
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(1.0)) * 0.4
        - F.least(digit_ratio * 2, F.lit(1.0)) * 0.2
        + (uniq_ratio - 0.5) * 0.2
    )
    return docs.select(
        _ID,
        n.cast("long").alias("n_chars_measured"),
        n_toks.cast("long").alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        uniq_ratio.alias("uniq_token_ratio"),
        score.alias("quality_score"),
    )


# -- token stats -----------------------------------------------------------

def doc_token_stats(docs: DataFrame) -> DataFrame:
    toks = _ascii_tokens()
    return docs.select(
        _ID,
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        # fold over the SAME toks Column — re-deriving the tokenizer in an
        # F.expr SQL string invites the backslash-eating drift doc_url_stats
        # documents
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("total_token_chars"),
    )


def doc_dedup_keep(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    length_bucket: int = 64,
    max_block_size: int = 64,
    salt_mode: str = "rank",
    method: str = "arrow",
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """End-to-end document dedup decision: ``(doc_id, cluster_id, keep)``
    for EVERY document, with exactly one keeper (the minimum doc_id) per
    duplicate component.

    This is the curation pipeline's terminal verdict — the composition of
    exact dedup (byte-identical texts), blocked shingle-Jaccard near-dup
    edges, and large-star/small-star transitive resolution (a near-dup of a
    near-dup drops even when the endpoints' own Jaccard misses the
    threshold). Mirrors the conversation pipeline's exact+fuzzy merge
    (translink/pipeline.py) on the flat document corpus; reference analog:
    the full scan -> group -> verify -> report chain in
    ``src/pipeline/mod.rs:99-118``.

    Scale shape: exact edges are linear star edges off a digest window
    (never text through the exchange), near-dup edges come from the salted
    block join, and CC shuffles 16-byte edge rows for O(log n) rounds.
    """
    cfg = cfg or LinkConfig()
    exact_edges = (
        doc_exact_dup_clusters(docs)
        .filter(F.col(_ID) != F.col("cluster_id"))
        .select(F.col("cluster_id").alias("src"), F.col(_ID).alias("dst"))
    )
    near_edges = doc_jaccard_pairs(
        docs, threshold, shingle_n, length_bucket,
        max_block_size, salt_mode, method,
    ).select(F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst"))

    from translink.clustering import connected_components

    comp = connected_components(
        exact_edges.unionByName(near_edges), cfg
    ).select(F.col("conv_id").alias(_ID), "cluster_id")
    return (
        docs.select(_ID)
        .join(comp, _ID, "left")
        .select(
            _ID,
            F.coalesce("cluster_id", F.col(_ID)).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col(_ID)) == F.col(_ID)).alias("keep"),
        )
    )


# GPT-2-style pre-tokenizer, restricted to the Java/RE2-portable subset
# (no lookarounds, ASCII classes): contractions, space-prefixed letter runs,
# space-prefixed digit runs, space-prefixed punctuation runs, whitespace
# runs. Leftmost-first alternation tokenizes identically in both engines.
BPE_TOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def doc_bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Pre-tokenizer-accurate token counts: the BPE-ish regex pass every
    GPT-family tokenizer runs before merges. ``n_bpe_pretokens`` upper-
    bounds (and at the pre-merge layer, equals) what a real tokenizer would
    see far better than whitespace splitting — the count a token-budgeted
    curation pipeline actually bills against. Whole-stage-codegen regex,
    one map pass, no UDF; whitespace runs are excluded from the count
    (they merge into following tokens in real BPE)."""
    text = F.coalesce("text", F.lit(""))
    toks = F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    nonspace = F.filter(toks, lambda t: t.rlike(r"[^\s]"))
    return docs.select(
        _ID,
        F.size(toks).cast("long").alias("n_pretokens_raw"),
        F.size(nonspace).cast("long").alias("n_bpe_pretokens"),
        F.size(F.array_distinct(nonspace)).cast("long").alias("n_unique_pretokens"),
    )


def doc_source_stats(docs: DataFrame) -> DataFrame:
    """Per-source curation dashboard: volume, exact-duplicate rate, and size
    profile for every ``source`` in the corpus.

    This is the aggregate a 100 TB curation run keys its source-level
    keep/drop decisions off (a crawl seed whose duplicate fraction is 0.9 is
    boilerplate; one whose mean length is 40 chars is navigation chrome).
    Reference analog: the per-scan global statistics block
    (``src/pipeline/stats.rs:156-183``) sliced by source instead of whole-run.

    One shuffle on the (low-cardinality) source key; the duplicate rate
    comes from a digest count-distinct so only 16-byte md5s reach the
    exchange, never text.
    """
    text = F.coalesce("text", F.lit(""))
    return (
        docs.select(
            "source",
            F.length(text).cast("long").alias("n"),
            F.md5(text).alias("digest"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("digest").alias("n_unique_texts"),
            F.sum("n").alias("total_chars"),
            F.min("n").alias("min_chars"),
            F.max("n").alias("max_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique_texts",
            (
                F.lit(1.0)
                - F.col("n_unique_texts") / F.col("n_docs")
            ).alias("dup_frac"),
            "total_chars",
            (F.col("total_chars") / F.col("n_docs")).alias("mean_chars"),
            "min_chars",
            "max_chars",
        )
    )


def doc_line_dedup(docs: DataFrame, min_docs: int = 3) -> DataFrame:
    """CCNet-style line-level boilerplate strip: a non-empty line occurring
    in ``min_docs`` or more DISTINCT documents (headers, footers, cookie
    banners, nav chrome) is dropped from every document; surviving lines
    re-join in original order.

    Returns (doc_id, n_lines, n_stripped, clean_text). The line-level
    analog of ``translink.canonicalize.turn_boilerplate`` with the same
    scale shape: lines reduce to 16-byte md5 digests BEFORE the counting
    exchange and before the anti-join — line text never shuffles twice; the
    reconstruction sorts collected (idx, line) structs per document, no
    global window.
    """
    lines = docs.select(
        _ID,
        F.posexplode(
            F.split(F.coalesce("text", F.lit("")), "\n")
        ).alias("line_idx", "line"),
    ).withColumn("line_md5", F.md5("line"))
    bp = (
        lines.filter(F.col("line") != "")
        .groupBy("line_md5")
        .agg(F.countDistinct(_ID).alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(int(min_docs)))
        .select("line_md5")
    )
    kept = lines.join(bp, "line_md5", "left_anti")
    return (
        lines.groupBy(_ID)
        .agg(F.count("*").alias("n_lines"))
        .join(
            kept.groupBy(_ID).agg(
                F.count("*").alias("n_kept"),
                F.concat_ws(
                    "\n",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("line_idx", "line"))
                        ),
                        lambda s: s.getField("line"),
                    ),
                ).alias("clean_text"),
            ),
            _ID,
            "left",
        )
        .select(
            _ID,
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_stripped"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def doc_url_stats(docs: DataFrame) -> DataFrame:
    """Per-document link signals: URL count, distinct hosts, and the
    fraction of characters inside URLs — the classic link-density quality
    filter (a page that is mostly links is navigation, not prose).

    Pure codegen column ops over the portable Java/RE2 regex subset (same
    discipline as translink/pii.py): one map pass, no UDF, no shuffle."""
    text = F.coalesce("text", F.lit(""))
    url_pat = r"https?://[^\s]+"
    host_pat = r"https?://([^/\s]+)"
    urls = F.regexp_extract_all(text, F.lit(url_pat), F.lit(0))
    hosts = F.regexp_extract_all(text, F.lit(host_pat), F.lit(1))
    # Fold over the SAME Column as n_urls — re-embedding the pattern in an
    # F.expr SQL string corrupts it (the SQL literal parser eats the
    # backslash, turning [^\s]+ into [^s]+).
    url_chars = F.aggregate(
        urls, F.lit(0).cast("long"), lambda acc, u: acc + F.length(u)
    )
    return docs.select(
        _ID,
        F.size(urls).cast("long").alias("n_urls"),
        F.size(F.array_distinct(hosts)).cast("long").alias("n_unique_hosts"),
        (url_chars / F.greatest(F.length(text), F.lit(1))).alias("url_char_frac"),
    )


# -- fingerprints (H10/H11 analog) -----------------------------------------

def doc_fingerprint(docs: DataFrame) -> DataFrame:
    text = F.coalesce("text", F.lit(""))
    return docs.select(
        _ID,
        F.md5(text).alias("fingerprint_md5"),
        F.substring(F.md5(text), 1, 8).alias("fingerprint_prefix"),
        F.xxhash64(text).alias("fingerprint_xx64"),
        F.length(text).cast("long").alias("n_chars_measured"),
    )


# -- repetition signals (Gopher-style quality features) ----------------------

_REPETITION_FIELDS = [
    ("n_tokens", "long"), ("n_unique_tokens", "long"),
    ("top_token_frac", "double"), ("n_bigrams", "long"),
    ("top_bigram_frac", "double"), ("dup_bigram_frac", "double"),
]


def _repetition_struct_type():
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    return StructType([
        StructField(name, LongType() if t == "long" else DoubleType())
        for name, t in _REPETITION_FIELDS
    ])


@pandas_udf(_repetition_struct_type())
def _repetition_kernel(hashes: pd.Series) -> pd.DataFrame:
    """Per-document token/bigram repetition counts over 64-bit token hashes,
    fully vectorized across the Arrow batch.

    Per-(row, value) counts come from one ``np.lexsort`` + run-length pass
    over the flattened (row_idx, hash) pairs; bigram hashes are derived in
    numpy from adjacent token hashes (``h[i]*PHI64 ^ rot17(h[i+1])`` —
    order-sensitive so 'a b' != 'b a') with the row-boundary positions
    masked out, then counted by the same pass. All ratios are one IEEE
    divide of exact integer counts, so the values match the expression
    form bit-for-bit (absent 64-bit token-hash collisions, which the
    parity test pins at fixture scale)."""
    import numpy as np

    n_rows = len(hashes)
    arrs = [
        np.asarray(v, dtype=np.int64) if v is not None else np.empty(0, np.int64)
        for v in hashes
    ]
    lens = np.fromiter((len(a) for a in arrs), np.int64, count=n_rows)
    total = int(lens.sum())
    n_uniq = np.zeros(n_rows, np.int64)
    max_tok = np.zeros(n_rows, np.int64)
    max_bg = np.zeros(n_rows, np.int64)
    n_distinct_bg = np.zeros(n_rows, np.int64)

    def _group_counts(r, v):
        order = np.lexsort((v, r))
        rs, vs = r[order], v[order]
        new = np.ones(len(rs), bool)
        new[1:] = (rs[1:] != rs[:-1]) | (vs[1:] != vs[:-1])
        gid = np.cumsum(new) - 1
        return rs[new].astype(np.intp), np.bincount(gid)

    if total:
        flat = np.concatenate([a for a in arrs if len(a)])
        row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        grow, counts = _group_counts(row_idx, flat)
        n_uniq = np.bincount(grow, minlength=n_rows).astype(np.int64)
        np.maximum.at(max_tok, grow, counts)
        same_row = row_idx[1:] == row_idx[:-1]
        if same_row.any():
            u = flat.view(np.uint64)
            bh = (u[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ (
                (u[1:] << np.uint64(17)) | (u[1:] >> np.uint64(47))
            )
            brow = row_idx[1:][same_row]
            growb, countsb = _group_counts(brow, bh[same_row].view(np.int64))
            n_distinct_bg = np.bincount(growb, minlength=n_rows).astype(np.int64)
            np.maximum.at(max_bg, growb, countsb)

    n_bg = np.maximum(lens - 1, 0)
    safe_n = np.maximum(lens, 1).astype(np.float64)
    safe_bg = np.maximum(n_bg, 1).astype(np.float64)
    return pd.DataFrame({
        "n_tokens": lens,
        "n_unique_tokens": n_uniq,
        "top_token_frac": max_tok / safe_n,
        "n_bigrams": n_bg,
        "top_bigram_frac": max_bg / safe_bg,
        "dup_bigram_frac": (n_bg - n_distinct_bg) / safe_bg,
    })


def doc_repetition(docs: DataFrame, method: str = "arrow") -> DataFrame:
    """Within-document repetition signals for training-data curation — the
    Gopher-style repetition filters (Rae et al. 2021, arXiv:2112.11446 §A1.1)
    on token granularity: fraction of tokens belonging to the most frequent
    token, most frequent bigram, and the duplicate-bigram fraction. The
    reference's structure-analysis stage computes the same family of
    repetition ratios per file (``src/pipeline/quick_check.rs:333-370``).

    Output: (doc_id, n_tokens, n_unique_tokens, top_token_frac, n_bigrams,
    top_bigram_frac, dup_bigram_frac). Empty/null text -> zeros.

    ``method='arrow'`` (default, the scale path): token hashes are computed
    JVM-side (codegen xxhash64 inside one single-level transform) and one
    Arrow kernel pass counts per-row — ZERO shuffle, O(corpus tokens)
    map-side work. ``method='expr'``: explode + two hash aggregations,
    ANSI-reproducible for the DuckDB oracle, but it shuffles one row per
    token + one per bigram of the corpus — never the public default at
    scale. Ratios agree bit-for-bit (same integer counts, one divide)."""
    toks = _ascii_tokens()
    if method == "arrow":
        hashed = docs.repartition(_parallelism(docs)).select(
            _ID, F.transform(toks, lambda t: F.xxhash64(t)).alias("_th")
        )
        return hashed.select(
            _ID, _repetition_kernel(F.col("_th")).alias("_r")
        ).select(_ID, "_r.*")
    base = docs.select(_ID, toks.alias("_toks"))
    tok_counts = (
        base.select(_ID, F.explode("_toks").alias("tk"))
        .groupBy(_ID, "tk").agg(F.count("*").alias("c"))
        .groupBy(_ID).agg(F.max("c").alias("_max_tok"))
    )
    bigram = F.expr(
        "transform(sequence(1, size(_toks) - 1), "
        "i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"
    )
    bg_counts = (
        base.filter(F.size("_toks") >= 2)
        .select(_ID, F.explode(bigram).alias("bg"))
        .groupBy(_ID, "bg").agg(F.count("*").alias("c"))
        .groupBy(_ID).agg(
            F.max("c").alias("_max_bg"), F.count("*").alias("_n_distinct_bg")
        )
    )
    n = F.col("_n")
    return (
        base.select(
            _ID,
            F.size("_toks").cast("long").alias("_n"),
            F.size(F.array_distinct("_toks")).cast("long").alias("_nu"),
        )
        .join(tok_counts, _ID, "left")
        .join(bg_counts, _ID, "left")
        .select(
            _ID,
            n.alias("n_tokens"),
            F.col("_nu").alias("n_unique_tokens"),
            F.when(n > 0, F.coalesce("_max_tok", F.lit(0)) / n)
            .otherwise(F.lit(0.0)).alias("top_token_frac"),
            F.greatest(n - 1, F.lit(0)).cast("long").alias("n_bigrams"),
            F.when(n >= 2, F.coalesce("_max_bg", F.lit(0)) / (n - 1))
            .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
            F.when(n >= 2, (n - 1 - F.coalesce("_n_distinct_bg", F.lit(0))) / (n - 1))
            .otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
        )
    )


# -- passage-level dedup (sub-document granularity) --------------------------

def doc_passage_stats(
    docs: DataFrame, passage_tokens: int = 16, method: str = "hash"
) -> DataFrame:
    """Corpus-wide EXACT dedup at sub-document (k-token passage) granularity
    — the training-data operation behind substring/passage dedup (Lee et al.
    2022, arXiv:2107.06499): a document that is globally unique can still be
    90% boilerplate passages copied across the corpus. Documents are split
    into consecutive ``passage_tokens``-token passages (tail passage kept,
    possibly shorter); a passage is *duplicated* if its exact token sequence
    occurs anywhere else in the corpus, and *redundant* if it is not the
    canonical first occurrence (ordered by doc_id, passage_idx). The
    reference's hash-and-group stage applies the same content-equality
    grouping at whole-file granularity (``src/pipeline/stats.rs:63-118``).

    Output: (doc_id, n_passages, n_dup_passages, n_redundant_passages,
    dup_passage_frac); docs with no tokens report zeros.

    ``method='hash'`` (default, the scale path): passages are reduced
    JVM-side to 8-byte ``xxhash64`` keys over the token-array slice — the
    corpus-wide grouping is a genuine shuffle (cross-document equality needs
    one) but it moves 24-byte rows, never text. ``method='expr'`` groups on
    the passage STRING (ANSI-reproducible for the DuckDB oracle): the
    exchange then carries the corpus text — oracle-only at scale."""
    toks = _ascii_tokens()
    k = int(passage_tokens)
    payload = (
        f"array_join(slice(_toks, (i - 1) * {k} + 1, {k}), ' ')"
        if method == "expr"
        else f"xxhash64(slice(_toks, (i - 1) * {k} + 1, {k}))"
    )
    passages_expr = F.expr(
        "CASE WHEN size(_toks) = 0 THEN array() ELSE "
        f"transform(sequence(1, cast(ceil(size(_toks) / {k}.0) as int)), "
        f"i -> {payload}) END"
    )
    base = docs.select(_ID, toks.alias("_toks"))
    passages = base.select(
        _ID, F.posexplode(passages_expr).alias("passage_idx", "p")
    )
    w_occ = Window.partitionBy("p")
    w_rank = Window.partitionBy("p").orderBy(_ID, "passage_idx")
    per_doc = (
        passages.select(
            _ID,
            F.count("*").over(w_occ).alias("occ"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .groupBy(_ID)
        .agg(
            F.count("*").alias("_np"),
            F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).alias("_nd"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("_nr"),
        )
    )
    return (
        base.select(_ID)
        .join(per_doc, _ID, "left")
        .select(
            _ID,
            F.coalesce("_np", F.lit(0)).cast("long").alias("n_passages"),
            F.coalesce("_nd", F.lit(0)).cast("long").alias("n_dup_passages"),
            F.coalesce("_nr", F.lit(0)).cast("long").alias("n_redundant_passages"),
            F.when(
                F.coalesce("_np", F.lit(0)) > 0, F.coalesce("_nd", F.lit(0)) / F.col("_np")
            ).otherwise(F.lit(0.0)).alias("dup_passage_frac"),
        )
    )


# -- corpus-wide boilerplate mining (top-k frequent n-grams) -----------------

def corpus_top_ngrams(docs: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """Most frequent word ``n``-grams across the corpus with occurrence and
    document-frequency counts — the mining pass behind boilerplate lists
    (``doc_line_dedup`` consumes line-level dupes; this surfaces phrase-level
    templates worth stripping or decontaminating against).

    Plan shape at scale: one map pass generates grams (``transform`` over the
    token array — JVM codegen, no explode-per-char anywhere), one hash
    aggregation with map-side partial combine on the gram key, then a
    ``TakeOrderedAndProject`` top-k — no global sort materializes. Document
    frequency comes from a per-(gram, doc) pre-distinct, the standard
    two-step that keeps the count-distinct exchange keyed on (gram, doc_id)
    instead of funneling per-gram sets. Ties at rank k are broken by gram
    text, so the result is a total order in every engine.

    Reference analog: the reference counts duplicate groups and sizes
    corpus-wide (``src/pipeline/stats.rs``); this is the same global
    frequency rollup at n-gram granularity.
    """
    toks = _ascii_tokens()
    gram_parts = ", ".join(f"element_at(_toks, i + {j})" for j in range(n))
    grams = (
        docs.select(_ID, toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(
            _ID,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_toks) - {n - 1}), "
                    f"i -> concat_ws(' ', {gram_parts}))"
                )
            ).alias("ngram"),
        )
    )
    per_doc = grams.groupBy("ngram", _ID).agg(F.count("*").alias("_c"))
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.sum("_c").cast("long").alias("n_occurrences"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


# -- per-source exact length percentiles (histogram-based, integer-exact) ---

def doc_source_percentiles(docs: DataFrame) -> DataFrame:
    """Per-source discrete length percentiles (p50/p90/p99) plus min/max —
    the size-profile pass a dataset-mix report needs, computed EXACTLY and
    in integers (no interpolation, so Spark and any SQL engine agree bit
    for bit).

    Scale path: the corpus is first collapsed to a per-(source, n_chars)
    histogram (hash aggregation, map-side combine — the only exchange that
    sees corpus-cardinality rows). The cumulative window then runs over
    DISTINCT length values per source, not rows, so the sort inside the
    window is bounded by value cardinality (~max document length), not by
    corpus size. The discrete p-th percentile is the smallest length whose
    cumulative count reaches ``ceil(p * n)``.
    """
    hist = docs.groupBy("source", "n_chars").agg(F.count("*").alias("_c"))
    w_cum = Window.partitionBy("source").orderBy("n_chars")
    w_all = Window.partitionBy("source")
    cum = hist.select(
        "source",
        "n_chars",
        F.sum("_c").over(w_cum).alias("_cum"),
        F.sum("_c").over(w_all).alias("_n"),
    )

    def _pick(p: float, name: str) -> F.Column:
        need = F.ceil(F.col("_n") * F.lit(p))
        return (
            F.min(F.when(F.col("_cum") >= need, F.col("n_chars")))
            .cast("long")
            .alias(name)
        )

    return cum.groupBy("source").agg(
        F.max("_n").cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        _pick(0.5, "p50_chars"),
        _pick(0.9, "p90_chars"),
        _pick(0.99, "p99_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


def doc_source_profile_sketch(
    docs: DataFrame,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    rsd: float = 0.02,
) -> DataFrame:
    """Sketch-based per-source profile — the bounded-memory twin of
    ``doc_source_percentiles`` + ``doc_source_stats`` for corpora where
    even the per-(source, n_chars) histogram is too wide to window over:

    - length quantiles via ``approx_percentile`` (Greenwald-Khanna-style
      mergeable sketch: each partial aggregate holds O(accuracy) entries
      regardless of group size, and partials combine map-side, so the
      exchange carries one sketch per (partition, source) — never values);
    - distinct-text cardinality via ``approx_count_distinct`` (HLL++,
      relative error ``rsd``; the exact twin's count-distinct shuffles
      every digest once).

    The sketch answers are engine-specific, so there is no DuckDB twin
    (rows-only); pytest pins them against the exact operators — quantiles
    are EXACT whenever a group is smaller than ``accuracy`` (the GK sketch
    degrades to a full buffer), and HLL must land within 3 standard
    errors. NULL ``n_chars``/``text`` rows are skipped by both sketches
    (Spark aggregate semantics); ``n_docs`` counts every row.
    """
    ps = list(percentiles)
    pcols = [
        F.element_at(F.col("_q"), i + 1).cast("long")
        .alias(f"p{int(round(p * 100))}_chars")
        for i, p in enumerate(ps)
    ]
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.approx_count_distinct("text", rsd).alias("approx_distinct_texts"),
            F.percentile_approx(
                "n_chars", F.array(*[F.lit(p) for p in ps]), F.lit(accuracy)
            ).alias("_q"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            "source", "n_docs", "approx_distinct_texts", *pcols,
            "min_chars", "max_chars", "total_chars",
        )
    )


# -- composite curation verdict (the full keep/drop decision) ----------------

def doc_curation_verdict(
    docs: DataFrame,
    quality_min: float = 0.965,
    threshold: float = 0.5,
) -> DataFrame:
    """The curation pass a training-data pipeline actually ships: one row
    per document with every gate's verdict and the final ``keep``.

    Gates (each lane is itself an oracle-checked operator):
    - ``keep_dedup``  — exact + near-dup transitive resolution keeps one
      doc per duplicate component (``doc_dedup_keep``);
    - ``quality_ok``  — blended quality score >= ``quality_min`` (default
      pinned near the fixture's 10th percentile so the gate is non-trivial)
      (``doc_quality``; both engines produce bit-identical doubles, so
      the threshold comparison cannot straddle);
    - ``lang_ok``     — the language heuristic recognized the document
      (``doc_langid`` guess != 'und').

    Plan shape: three doc_id-keyed lanes joined by sort-merge — the two
    cheap lanes are pure map passes over the scan, so the joins add two
    exchanges keyed on the 8-byte id, never on text. At corpus scale the
    dedup lane dominates (it is the pipeline); the verdict join is noise.
    """
    gate_q = F.col("quality_score") >= quality_min
    gate_l = F.col("lang_guess") != "und"
    dedup = doc_dedup_keep(docs, threshold=threshold).select(
        _ID, "cluster_id", F.col("keep").alias("keep_dedup")
    )
    qual = doc_quality(docs).select(_ID, "quality_score")
    lang = doc_langid(docs).select(_ID, "lang_guess")
    return (
        dedup.join(qual, _ID)
        .join(lang, _ID)
        .select(
            _ID,
            "cluster_id",
            "keep_dedup",
            gate_q.alias("quality_ok"),
            gate_l.alias("lang_ok"),
            (F.col("keep_dedup") & gate_q & gate_l).alias("keep"),
        )
    )
