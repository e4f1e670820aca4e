"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video ride as opaque ``binary`` columns plus a typed metadata
struct; decode/feature-extraction run as Arrow-batched ``mapInPandas``
kernels so each partition streams through Python in bounded batches (the
Spark analog of the reference's MIME magic-number detection and
content-structure analysis, ``src/pipeline/quick_check.rs:292-370``).

The actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_image_batch`` raises NotImplementedError unless the
deterministic fake decoder is requested. Everything around it — schema,
partitioning, UDF signatures, batch iteration, metadata extraction — is real
and tested, so dropping in a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

#: Canonical schema for a multimodal asset table.
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("media_type", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), True),        # opaque bytes
    StructField("source", StringType(), True),
])

#: Output schema of the feature-extraction kernel.
FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("magic", StringType(), True),          # sniffed container
    StructField("width", IntegerType(), True),         # fake-decoded dims
    StructField("height", IntegerType(), True),
    StructField("feature_hash", LongType(), True),     # digest of features
])

#: Magic-number table (public container signatures; analog of the
#: reference's detect_mime_type, src/pipeline/quick_check.rs:292-330).
_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG", "png"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"OggS", "ogg"),
    (b"\x1aE\xdf\xa3", "matroska"),
    (b"ID3", "mp3"),
]


def sniff_magic(payload: bytes | None) -> str | None:
    if not payload:
        return None
    for sig, name in _MAGIC:
        if payload.startswith(sig):
            return name
    return "unknown"


def decode_image_batch(payloads: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Decode a batch of image payloads to (width, height, feature_hash).

    Real decoding requires an image library not present in this container —
    STUB: raises NotImplementedError. With ``fake=True`` a deterministic
    stand-in derives dims and a feature hash from the bytes themselves, so
    the distributed plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "no image codec in this environment; pass fake=True for the "
            "deterministic stand-in decoder"
        )
    widths, heights, hashes = [], [], []
    for p in payloads:
        if p is None or len(p) == 0:
            widths.append(None); heights.append(None); hashes.append(None)
            continue
        arr = np.frombuffer(p, dtype=np.uint8)
        widths.append(int(16 + arr[: 8].sum() % 1024))
        heights.append(int(16 + arr[-8:].sum() % 1024))
        h = int(np.int64(arr.astype(np.int64).sum() * 1099511628211 % (1 << 63)))
        hashes.append(h)
    return pd.DataFrame({"width": widths, "height": heights, "feature_hash": hashes})


def extract_features(assets: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Distributed feature extraction over the asset table via mapInPandas.

    Arrow batches stream through the kernel per partition — constant memory
    regardless of table size; repartition upstream to bound batch payload
    bytes (spark.sql.execution.arrow.maxRecordsPerBatch caps rows)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode_image_batch(pdf["payload"], fake=fake_decode)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "magic": pdf["payload"].map(sniff_magic),
                "width": decoded["width"],
                "height": decoded["height"],
                "feature_hash": decoded["feature_hash"],
            })

    return assets.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def dedup_by_feature(features: DataFrame) -> DataFrame:
    """Exact-duplicate assets by feature hash (hash-and-group A5 on the
    multimodal path)."""
    from pyspark.sql import Window

    w = Window.partitionBy("feature_hash")
    return (
        features
        .filter(F.col("feature_hash").isNotNull())
        .select(
            "asset_id", "feature_hash",
            F.min("asset_id").over(w).alias("cluster_id"),
            F.count("*").over(w).alias("group_size"),
        )
        .filter(F.col("group_size") >= 2)
    )


def synthetic_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests (seeded bytes; a few planted
    byte-identical duplicates and recognizable magic headers)."""
    rng = np.random.default_rng(seed)
    rows = []
    headers = [b"\xff\xd8\xff\xe0", b"\x89PNG\r\n", b"GIF89a", b"RIFF\x00\x00"]
    for i in range(n):
        hdr = headers[i % len(headers)]
        body = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        payload = hdr + body
        rows.append((i, "image", payload, f"src{i % 3}"))
    # planted exact duplicates of asset 0 and 1
    rows.append((n, "image", rows[0][2], "dup"))
    rows.append((n + 1, "image", rows[1][2], "dup"))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
