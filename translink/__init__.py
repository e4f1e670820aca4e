"""translink — a from-scratch PySpark-native record-linkage engine.

Generalizes the hash-and-group duplicate-detection dataflow of the reference
(vadim-schultz/dedupe, a Rust streaming file-dedup CLI; see SURVEY.md) into a
blocking + pairwise-scoring + transitive-clustering pipeline over tables of
multi-turn conversation transcripts:

    transcripts(conv_id, turn_idx, role, text, tool, ts)

Pipeline stages (each a pure ``DataFrame -> DataFrame`` function, mirroring the
reference's ``PipelineStage`` contract, reference ``src/pipeline/mod.rs:38-50``):

  canonicalize -> signatures -> blocking -> candidates -> scoring -> clustering

All hot-path logic is JVM-side ``pyspark.sql.functions``; where codegen can't
express a kernel (k-permutation MinHash, hashed shingles, SimHash votes,
Jaro-Winkler, ANN buckets/cosine) it runs as an Arrow-batched, numpy-vectorized
pandas UDF — no per-row Python anywhere.
"""

from translink.config import LinkConfig, PROFILES, load_config
from translink.session import get_spark
from translink.canonicalize import canonicalize
from translink.signatures import with_exact_digest, with_minhash
from translink.blocking import with_block_key, with_salt, lsh_band_keys
from translink.candidates import candidate_pairs, lsh_candidate_pairs
from translink.scoring import score_pairs
from translink.clustering import connected_components, exact_clusters
from translink.evaluate import bcubed_prf, blocking_quality, pairwise_prf
from translink.pipeline import run_pipeline
from translink.report import cluster_report, deduplicate, elect_primary

__version__ = "0.3.0"

__all__ = [
    "LinkConfig", "PROFILES", "load_config", "get_spark", "canonicalize",
    "with_exact_digest", "with_minhash", "with_block_key", "with_salt",
    "lsh_band_keys", "candidate_pairs", "lsh_candidate_pairs", "score_pairs",
    "connected_components", "exact_clusters", "pairwise_prf",
    "blocking_quality", "bcubed_prf", "run_pipeline",
    "cluster_report", "deduplicate", "elect_primary",
]
