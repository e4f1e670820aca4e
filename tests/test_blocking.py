"""Blocking & salting: bounded block sizes, candidate-pair accounting.

Mirrors the reference's grouping-stage tests (``tests/pipeline_test.rs:38-83``)
and the skew scenarios (``tests/multithreading_test.rs:159-204``).
"""

from pyspark.sql import functions as F

from translink.blocking import lsh_band_keys, oversized_blocks, with_block_key, with_salt
from translink.candidates import candidate_pairs
from translink.canonicalize import canonicalize
from translink.config import LinkConfig
from translink.signatures import with_exact_digest, with_minhash


def _blocked(tiny, cfg):
    signed = with_exact_digest(canonicalize(tiny["transcripts"], cfg))
    return with_salt(with_block_key(signed, cfg), ["block_key"], cfg)


def test_salt_bounds_every_block(spark, tiny):
    cfg = LinkConfig(max_block_size=8)
    b = _blocked(tiny, cfg)
    worst = (
        b.groupBy("block_key", "salt").count()
        .agg(F.max("count").alias("m")).first()["m"]
    )
    # hash-mode salt balances in expectation; allow 3x headroom, but the
    # unsalted hot block (>=20 members) must have been split
    assert worst <= 3 * cfg.max_block_size
    assert oversized_blocks(b, cfg).count() >= 1


def test_rank_salt_is_exact_bound(spark, tiny):
    cfg = LinkConfig(max_block_size=8, salt_mode="rank")
    b = _blocked(tiny, cfg)
    worst = (
        b.groupBy("block_key", "salt").count()
        .agg(F.max("count").alias("m")).first()["m"]
    )
    assert worst <= cfg.max_block_size


def test_each_pair_emitted_once(spark, tiny):
    cfg = LinkConfig(max_block_size=64)
    pairs = candidate_pairs(_blocked(tiny, cfg), cfg, payload_cols=[])
    n = pairs.count()
    assert pairs.select("conv_id_a", "conv_id_b").distinct().count() == n
    bad = pairs.filter(F.col("conv_id_a") >= F.col("conv_id_b")).count()
    assert bad == 0


def test_pair_count_matches_block_arithmetic(spark, tiny):
    """candidate count == sum over (block, salt) of C(size, 2)."""
    cfg = LinkConfig(max_block_size=16, salt_mode="rank")
    b = _blocked(tiny, cfg)
    expected = (
        b.groupBy("block_key", "salt").count()
        .select(F.sum(F.expr("count * (count - 1) / 2")).alias("s"))
        .first()["s"]
    )
    pairs = candidate_pairs(b, cfg, payload_cols=[])
    assert pairs.count() == int(expected)


def test_exact_dup_pairs_share_block(spark, tiny):
    """Byte-identical conversations always share the attribute block key."""
    cfg = LinkConfig()
    signed = with_exact_digest(canonicalize(tiny["transcripts"], cfg))
    b = with_block_key(signed, cfg)
    n_keys_per_digest = (
        b.groupBy("digest").agg(F.countDistinct("block_key").alias("k"))
        .agg(F.max("k").alias("m")).first()["m"]
    )
    assert n_keys_per_digest == 1


def test_lsh_band_count(spark, tiny):
    cfg = LinkConfig(num_hashes=32, lsh_bands=8)
    signed = with_minhash(canonicalize(tiny["transcripts"], cfg).limit(10), cfg)
    bands = lsh_band_keys(signed, cfg)
    assert bands.count() == 10 * 8
    assert bands.select("band_id").distinct().count() == 8

def test_oversized_blocks_generic_over_band_keys(spark, tiny):
    """The overflow metric must work on ANY salted table, keyed the same
    way as its with_salt call — here LSH band blocks, where a hot bucket
    (e.g. a near-constant signature) is the likelier skew source. Also
    pins n_salt = ceil(size / max): max(salt)+1 understates fan-out in
    hash salt mode."""
    cfg = LinkConfig(num_hashes=32, lsh_bands=8, max_block_size=4)
    signed = with_minhash(canonicalize(tiny["transcripts"], cfg), cfg)
    bands = with_salt(
        lsh_band_keys(signed, cfg), ["band_id", "band_hash"], cfg
    )
    over = oversized_blocks(bands, cfg, key_cols=["band_id", "band_hash"])
    rows = over.collect()
    assert len(rows) >= 1  # the fixture's exact-dup groups overflow 4
    for r in rows:
        assert r["block_size"] > cfg.max_block_size
        assert r["n_salt"] == -(-r["block_size"] // cfg.max_block_size)
