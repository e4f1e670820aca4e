"""Pipeline configuration.

Mirrors the reference's config surface (``src/config.rs:64-105`` +
``config.example.yaml:1-63``): similarity threshold, sample-size bounds, and
performance-mode presets (``src/main.rs:88-121`` chooses sample sizes, channel
capacities and batch sizes per mode; our analog chooses shuffle partitions and
Arrow batch sizes).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class LinkConfig:
    """All knobs of the linkage pipeline.

    Defaults are calibrated for the synthetic transcript fixtures
    (FIXTURES.md) and hold at scale: every bound exists to keep per-row,
    per-block and per-partition cost independent of total input size.
    """

    # ---- canonicalization (stage 0) -------------------------------------
    # Cap per-turn text taken into the canonical digest text. The reference
    # bounds sampled content the same way (<=64 KiB statistical sample,
    # src/pipeline/stats.rs:109-115; 3x8 KiB quick-check samples,
    # src/pipeline/streaming_quickcheck.rs:126-160).
    turn_text_cap: int = 4096
    # Drop conversations with fewer turns (reference: min_file_size filter,
    # src/pipeline/metadata.rs:32-37).
    min_turns: int = 1

    # ---- signatures (stage 1) -------------------------------------------
    num_hashes: int = 64          # MinHash signature length
    shingle_size: int = 3         # word n-gram shingle width
    # ---- blocking (stage 2) ---------------------------------------------
    length_bucket: int = 16       # total_chars // length_bucket blocking attr
    # Attribute blocking acts as the SHORT-TEXT fallback in the full
    # pipeline: conversations under this many chars have too few shingles
    # for reliable MinHash-LSH, so they get O(block^2) attribute candidates;
    # longer conversations rely on LSH alone (their attribute blocks would
    # contribute mostly random pairs at quadratic cost). None = no gate.
    attr_max_chars: int | None = 512
    lsh_bands: int = 16           # bands (rows = num_hashes // bands)
    max_block_size: int = 64      # salt fan-out bound per block (P8 skew guard)
    salt_mode: str = "hash"       # 'hash' (xxhash64(conv_id)) or 'rank' (row_number)
    # ---- scoring (stage 4) ----------------------------------------------
    # cap text length for O(n*m) Levenshtein: the quadratic term dominates
    # pair scoring (measured 67s of a 96s stage at cap=512, 63k pairs); 256
    # chars on canonical text still spans several turns
    lev_text_cap: int = 256
    jw_text_cap: int = 256        # cap text length for Jaro-Winkler pandas UDF
    w_jaccard: float = 0.4
    w_levenshtein: float = 0.3
    w_jaro_winkler: float = 0.3
    # Edge threshold on the blended score (reference's similarity_threshold
    # default 85.0 on a 0-100 scale, src/pipeline/stats.rs:44).
    threshold: float = 0.70
    # ---- clustering (stage 5) -------------------------------------------
    cc_max_iterations: int = 50
    # ---- execution ------------------------------------------------------
    shuffle_partitions: int = 32
    arrow_batch_size: int = 10_000

    def fingerprint(self) -> str:
        """Deterministic digest of the config — part of every stage's
        checkpoint identity (resume only reuses a stage written under an
        identical config; F6 idempotence semantics,
        src/pipeline/streaming_quickcheck.rs:112-114)."""
        payload = json.dumps(asdict(self), sort_keys=True)
        return hashlib.md5(payload.encode()).hexdigest()[:16]

    @property
    def lsh_rows(self) -> int:
        if self.num_hashes % self.lsh_bands:
            raise ValueError("num_hashes must be divisible by lsh_bands")
        return self.num_hashes // self.lsh_bands


# Performance-mode presets, analog of the reference's standard/high/ultra
# modes (src/main.rs:88-121, USAGE.md:257-261). On a real cluster these would
# scale executor counts; locally they scale shuffle partitions & batch sizes.
PROFILES: dict[str, LinkConfig] = {
    "standard": LinkConfig(shuffle_partitions=32, arrow_batch_size=5_000),
    "high": LinkConfig(shuffle_partitions=64, arrow_batch_size=10_000),
    "ultra": LinkConfig(shuffle_partitions=128, arrow_batch_size=20_000),
}
