"""Multimodal plumbing: schema, magic sniffing, mapInPandas kernel, dedup.

PNG, BMP, WAV, GIF, baseline JPEG (4:4:4 and 4:2:0) and AVI Motion-JPEG
decode FOR REAL (pure-stdlib codecs); containers with no codec here
(matroska/mp3/ogg, progressive JPEG, sampling factors above 2) stay behind
documented NotImplementedError boundaries, and everything distributed
around the codecs — schema, partitioning, UDF signature, batch shape — is
tested on both the real and the fake-decode paths."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from translink.multimodal import (
    decode_image_batch,
    dedup_by_feature,
    extract_features,
    sniff_magic,
    synthetic_assets,
)


def test_decode_stub_raises_without_fake():
    # a container family with no image codec (matroska/video) stays fenced
    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"\x1aE\xdf\xa3stream"]), fake=False)


def test_sniff_magic():
    assert sniff_magic(b"\xff\xd8\xff\xe0abc") == "jpeg"
    assert sniff_magic(b"\x89PNG\r\n") == "png"
    assert sniff_magic(b"GIF89a") == "gif"
    assert sniff_magic(b"\x00\x00\x00") == "unknown"
    assert sniff_magic(None) is None
    assert sniff_magic(b"") is None


def test_extract_features_distributed(spark):
    assets = synthetic_assets(spark, n=32).repartition(4)
    feats = extract_features(assets, fake_decode=True)
    rows = feats.collect()
    assert len(rows) == 34  # 32 + 2 planted dups
    by_id = {r["asset_id"]: r for r in rows}
    assert by_id[0]["magic"] == "jpeg"
    assert by_id[1]["magic"] == "png"
    assert by_id[2]["magic"] == "gif"
    assert all(r["n_bytes"] > 0 for r in rows)
    assert all(r["feature_hash"] is not None for r in rows)
    # deterministic: same payload -> same features
    assert by_id[32]["feature_hash"] == by_id[0]["feature_hash"]


def test_dedup_by_feature(spark):
    assets = synthetic_assets(spark, n=16)
    feats = extract_features(assets, fake_decode=True)
    clusters = dedup_by_feature(feats)
    got = {(r["asset_id"], r["cluster_id"]) for r in clusters.collect()}
    assert (16, 0) in got and (0, 0) in got   # planted dup of asset 0
    assert (17, 1) in got and (1, 1) in got   # planted dup of asset 1


def test_resize_images_real_resample(spark):
    """Resize plumbing: real nearest-neighbor resample around the fake
    codec; identical payloads -> identical thumbs; output bytes == w*h."""
    from translink.multimodal import resize_images

    assets = synthetic_assets(spark, n=16).repartition(3)
    rows = resize_images(assets, width=8, height=6).collect()
    by_id = {r["asset_id"]: r for r in rows}
    assert len(rows) == 18
    assert all(r["width"] == 8 and r["height"] == 6 for r in rows)
    assert all(len(r["thumb"]) == 48 for r in rows if r["thumb"] is not None)
    # planted duplicate payload -> byte-identical thumb + hash
    assert by_id[16]["thumb"] == by_id[0]["thumb"]
    assert by_id[16]["thumb_hash"] == by_id[0]["thumb_hash"]
    assert by_id[17]["thumb_hash"] == by_id[1]["thumb_hash"]
    # real-decode over these fake-header payloads fails INSIDE the kernel
    # (every synthetic header is followed by random bytes, not a valid
    # container stream for its now-real codec)
    with pytest.raises(Exception, match="codec|PNG|GIF|JPEG"):
        resize_images(assets, fake_decode=False).collect()


def test_sample_video_frames_stride_and_growth(spark):
    """Frame sampler: output cardinality exceeds input rows, stride and
    timestamps follow the configured fps, duplicates share frame hashes."""
    from translink.multimodal import sample_video_frames

    assets = synthetic_assets(spark, n=8).repartition(2)
    got = sample_video_frames(
        assets, frame_bytes=16, fps=25.0, every_nth=2, max_frames=3
    )
    rows = got.collect()
    assert len(rows) > 8  # growth: several frames per asset
    for r in rows:
        assert r["frame_idx"] % 2 == 0
        assert r["ts_ms"] == int(r["frame_idx"] * 1000.0 / 25.0)
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r)
    assert all(len(v) <= 3 for v in per_asset.values())
    # planted dup of asset 0 yields identical frame hash sequence
    seq = lambda aid: sorted(
        (r["frame_idx"], r["frame_hash"]) for r in per_asset[aid])
    assert seq(8) == seq(0)


def test_chunk_audio_windows_overlap(spark):
    """Audio chunker: hop < window -> overlapping windows, ms offsets from
    byte arithmetic, deterministic digests on the planted duplicate."""
    from translink.multimodal import chunk_audio

    assets = synthetic_assets(spark, n=8).repartition(2)
    rows = chunk_audio(assets, bytes_per_ms=1.0, window_ms=32,
                       hop_ms=16).collect()
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r)
    chunks = sorted(per_asset[0], key=lambda r: r["chunk_idx"])
    assert len(chunks) >= 3
    assert chunks[0]["start_ms"] == 0 and chunks[0]["end_ms"] == 32
    assert chunks[1]["start_ms"] == 16  # overlap: hop < window
    seq = lambda aid: sorted(
        (r["chunk_idx"], r["chunk_hash"]) for r in per_asset[aid])
    assert seq(8) == seq(0)


def test_feature_hash_is_order_sensitive():
    """Content hashes must distinguish permuted payloads: a byte-sum
    digest is permutation-invariant, so distinct assets collided and
    dedup_by_feature merged them as exact duplicates."""
    import pandas as pd

    from translink.multimodal import _hash_bytes, decode_image_batch

    a, b = b"\x00\x02" * 600, b"\x01\x01" * 600  # equal byte sums
    assert _hash_bytes(a) != _hash_bytes(b)
    out = decode_image_batch(pd.Series([a, b]), fake=True)
    assert out["feature_hash"][0] != out["feature_hash"][1]
    # and large payloads must not overflow (old int64-sum path did)
    big = bytes(range(256)) * 1024  # 256 KiB, byte-sum >> 2^63 / prime
    assert decode_image_batch(pd.Series([big]), fake=True)["feature_hash"][0] > 0


# ---------------------------------------------------------------------------
# Real PNG codec (pure-stdlib decode_png/encode_png)
# ---------------------------------------------------------------------------

def _seeded_img(shape, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=shape, dtype="uint8" if True else None).astype("uint8")


def test_png_round_trip_all_filters_and_colors():
    """encode→decode is the identity for every filter type (0-4, each
    exercising one decoder unfilter path) and channel count (gray, gray+
    alpha, RGB, RGBA)."""
    import numpy as np

    from translink.multimodal import decode_png, encode_png

    for shape in [(5, 7), (5, 7, 2), (6, 4, 3), (3, 9, 4)]:
        img = _seeded_img(shape)
        for ftype in range(5):
            out = decode_png(encode_png(img, filter_type=ftype))
            assert out.shape == img.shape, (shape, ftype)
            assert np.array_equal(out, img), (shape, ftype)


def test_png_paletted_decode():
    """Color type 3 expands PLTE entries to RGB."""
    import struct
    import zlib

    import numpy as np

    from translink.multimodal import decode_png

    # hand-build a 2x2 paletted PNG: indices [[0,1],[1,0]], palette R/G
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0])
    idat = zlib.compress(b"\x00\x00\x01" + b"\x00\x01\x00")
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", plte) + chunk(b"IDAT", idat)
           + chunk(b"IEND", b""))
    img = decode_png(png)
    assert img.shape == (2, 2, 3)
    assert np.array_equal(img[0, 0], [255, 0, 0])
    assert np.array_equal(img[0, 1], [0, 255, 0])


def test_png_malformed_and_unsupported():
    import struct
    import zlib

    import pytest

    from translink.multimodal import decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk")
    # corrupt a CRC byte
    good = bytearray(encode_png(_seeded_img((4, 4))))
    good[20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(good))
    # 16-bit depth: valid PNG, out of scope -> NotImplementedError

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png16 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
             + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
             + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(png16)


def test_extract_features_real_png_distributed(spark):
    """fake_decode=False end-to-end over a table of REAL PNGs: dims come
    from IHDR, the feature hash from decoded pixels (identical pixels
    encoded with different filters hash the same)."""
    import numpy as np

    from translink.multimodal import ASSET_SCHEMA, encode_png, extract_features

    imgs = {i: _seeded_img((8 + i, 5 + i, 3), seed=i) for i in range(6)}
    rows = [(i, "image", encode_png(img, filter_type=i % 5), "src")
            for i, img in imgs.items()]
    # asset 6: same pixels as asset 0, different filter -> same feature_hash
    rows.append((6, "image", encode_png(imgs[0], filter_type=2), "dup"))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA).repartition(3)
    feats = {r["asset_id"]: r
             for r in extract_features(assets, fake_decode=False).collect()}
    for i, img in imgs.items():
        assert (feats[i]["height"], feats[i]["width"]) == img.shape[:2]
        assert feats[i]["magic"] == "png"
    assert feats[6]["feature_hash"] == feats[0]["feature_hash"]
    assert feats[1]["feature_hash"] != feats[0]["feature_hash"]


def test_resize_images_real_png(spark):
    """Real-decode resize: 32x32 grayscale thumbs from RGB PNGs,
    deterministic across filter choices."""
    from translink.multimodal import ASSET_SCHEMA, encode_png, resize_images

    img = _seeded_img((40, 30, 3), seed=3)
    rows = [(0, "image", encode_png(img, filter_type=0), "s"),
            (1, "image", encode_png(img, filter_type=4), "s")]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    thumbs = {r["asset_id"]: r
              for r in resize_images(assets, 32, 32, fake_decode=False).collect()}
    assert len(thumbs[0]["thumb"]) == 32 * 32
    assert thumbs[0]["thumb_hash"] == thumbs[1]["thumb_hash"]


def test_real_decode_rejects_non_png(spark):
    import pandas as pd
    import pytest

    from translink.multimodal import decode_image_batch

    # ogg: a real container with no image codec here -> out-of-scope
    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"OggS\x00\x02..."]), fake=False)
    # gif/jpeg now have real codecs: a truncated one is MALFORMED, not
    # out-of-scope (corrupt-vs-unsupported taxonomy)
    with pytest.raises(ValueError):
        decode_image_batch(pd.Series([b"GIF89a..."]), fake=False)
    with pytest.raises(ValueError):
        decode_image_batch(pd.Series([b"\xff\xd8\xff\xe0..."]), fake=False)


# ---------------------------------------------------------------------------
# Real GIF codec (pure-stdlib LZW decode_gif/encode_gif)
# ---------------------------------------------------------------------------


def test_gif_round_trip_plain_and_interlaced():
    import numpy as np

    from translink.multimodal import decode_gif, encode_gif, sniff_magic

    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 5), (24, 24), (17, 31)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for interlace in (False, True):
            p = encode_gif(img, interlace=interlace)
            assert sniff_magic(p) == "gif"
            out = decode_gif(p)
            assert out.shape == (*shape, 3)
            for ch in range(3):  # grayscale palette: every channel == index
                assert (out[..., ch] == img).all(), (shape, interlace)


def test_gif_lzw_clear_at_12bit_cap():
    """A stream long enough that the literal-code encoder must emit CLEAR
    at the 12-bit width cap — pins the variable-width growth logic on both
    sides."""
    import numpy as np

    from translink.multimodal import decode_gif, encode_gif

    img = np.random.default_rng(11).integers(
        0, 256, size=(80, 80), dtype=np.uint8
    )
    out = decode_gif(encode_gif(img))
    assert (out[..., 0] == img).all()


def test_gif_malformed_taxonomy():
    import numpy as np
    import pytest

    from translink.multimodal import decode_gif, encode_gif

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_gif(img)
    for bad in (
        b"NOTGIF" + b"\x00" * 20,   # bad signature
        b"GIF89a" + b"\x00" * 5,    # truncated header
        good[:-30],                  # truncated LZW stream / missing trailer
        good[:13] + b"\x3b",         # trailer before any image
    ):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_extract_features_real_gif_distributed(spark):
    import numpy as np

    from translink.multimodal import ASSET_SCHEMA, encode_gif, extract_features

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
            for _ in range(3)]
    rows = [(i, "image", encode_gif(im), "src") for i, im in enumerate(imgs)]
    rows.append((3, "image", encode_gif(imgs[0]), "dup"))  # exact dup of 0
    assets = spark.createDataFrame(rows, ASSET_SCHEMA).repartition(2)
    feats = {r["asset_id"]: r
             for r in extract_features(assets, fake_decode=False).collect()}
    assert all(r["magic"] == "gif" and r["width"] == 16 and r["height"] == 16
               for r in feats.values())
    assert feats[0]["feature_hash"] == feats[3]["feature_hash"]
    assert feats[0]["feature_hash"] != feats[1]["feature_hash"]


# ---------------------------------------------------------------------------
# Real BMP codec (pure-stdlib decode_bmp/encode_bmp)
# ---------------------------------------------------------------------------

def test_bmp_round_trip_and_row_order():
    """encode→decode is the identity for bottom-up (default) and top-down
    row order, including widths whose stride needs padding."""
    import numpy as np

    from translink.multimodal import decode_bmp, encode_bmp

    for shape in [(5, 7, 3), (4, 4, 3), (3, 5, 3)]:  # 7*3=21 pads to 24
        img = _seeded_img(shape, seed=shape[1])
        for top_down in (False, True):
            out = decode_bmp(encode_bmp(img, top_down=top_down))
            assert out.shape == img.shape
            assert np.array_equal(out, img), (shape, top_down)


def test_bmp_paletted_decode():
    """8-bit paletted BMP expands BGRA palette quads to RGB."""
    import struct

    import numpy as np

    from translink.multimodal import decode_bmp

    # hand-build a 2x2 8-bit BMP: indices [[0,1],[1,0]], palette R/G (BGRA)
    pal = bytes([0, 0, 255, 0]) + bytes([0, 255, 0, 0])  # red, green
    # bottom-up rows, stride pads 2 bytes -> 4
    pix = bytes([1, 0, 0, 0]) + bytes([0, 1, 0, 0])  # bottom row first
    data_off = 14 + 40 + len(pal)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(pix),
                       2835, 2835, 2, 0)
    bmp = struct.pack("<2sIHHI", b"BM", data_off + len(pix), 0, 0,
                      data_off) + info + pal + pix
    img = decode_bmp(bmp)
    assert img.shape == (2, 2, 3)
    assert np.array_equal(img[0, 0], [255, 0, 0])   # top row from 2nd record
    assert np.array_equal(img[0, 1], [0, 255, 0])
    assert np.array_equal(img[1, 0], [0, 255, 0])


def test_bmp_malformed_and_unsupported():
    import struct

    import pytest

    from translink.multimodal import decode_bmp, encode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp")
    good = bytearray(encode_bmp(_seeded_img((4, 4, 3))))
    with pytest.raises(ValueError):
        decode_bmp(bytes(good[:40]))       # truncated header
    with pytest.raises(ValueError):
        decode_bmp(bytes(good[:-8]))       # truncated pixel data
    # RLE compression: valid header, out of scope
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(rle))
    # 32-bit depth: out of scope
    b32 = bytearray(good)
    b32[28:30] = struct.pack("<H", 32)
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(b32))


def test_extract_features_real_bmp_and_mixed(spark):
    """fake_decode=False over a MIXED table of real PNGs and BMPs: the
    kernel dispatches per payload by sniffed container; identical pixels
    hash identically ACROSS the two containers (hash covers decoded
    pixels, not encoded bytes)."""
    from translink.multimodal import (
        ASSET_SCHEMA, encode_bmp, encode_png, extract_features,
    )

    img = _seeded_img((9, 6, 3), seed=11)
    rows = [(0, "image", encode_png(img), "s"),
            (1, "image", encode_bmp(img), "s"),
            (2, "image", encode_bmp(_seeded_img((5, 5, 3), seed=2)), "s")]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA).repartition(2)
    feats = {r["asset_id"]: r
             for r in extract_features(assets, fake_decode=False).collect()}
    assert feats[1]["magic"] == "bmp"
    assert (feats[1]["height"], feats[1]["width"]) == (9, 6)
    assert feats[0]["feature_hash"] == feats[1]["feature_hash"]
    assert feats[2]["feature_hash"] != feats[1]["feature_hash"]


# ---------------------------------------------------------------------------
# Real WAV codec (pure-stdlib decode_wav/encode_wav)
# ---------------------------------------------------------------------------

def test_wav_round_trip():
    """encode→decode is the identity for 8-bit mono and 16-bit stereo,
    and the sample rate survives."""
    import numpy as np

    from translink.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(5)
    mono8 = rng.integers(0, 256, size=301, dtype=np.uint8)  # odd data len
    out, rate = decode_wav(encode_wav(mono8, sample_rate=8000))
    assert rate == 8000 and out.shape == (301, 1)
    assert np.array_equal(out[:, 0], mono8)
    stereo16 = rng.integers(-32768, 32768, size=(200, 2)).astype(np.int16)
    out, rate = decode_wav(encode_wav(stereo16, sample_rate=44100))
    assert rate == 44100 and out.shape == (200, 2)
    assert np.array_equal(out, stereo16)


def test_wav_malformed_and_unsupported():
    import struct

    import numpy as np
    import pytest

    from translink.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI data")
    good = bytearray(encode_wav(np.zeros(64, dtype=np.int16)))
    with pytest.raises(ValueError):
        decode_wav(bytes(good[:30]))       # truncated chunk
    # float PCM (format tag 3): valid container, out of scope
    f32 = bytearray(good)
    f32[20:22] = struct.pack("<H", 3)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(f32))
    # 24-bit: out of scope (block_align patched to stay consistent)
    b24 = bytearray(good)
    b24[34:36] = struct.pack("<H", 24)
    b24[32:34] = struct.pack("<H", 3)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(b24))
    # inconsistent block_align: malformed
    bad = bytearray(good)
    bad[32:34] = struct.pack("<H", 7)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_sniff_magic_riff_forms():
    from translink.multimodal import sniff_magic

    assert sniff_magic(b"RIFF\x10\x00\x00\x00WAVEfmt ") == "wav"
    assert sniff_magic(b"RIFF\x10\x00\x00\x00AVI LIST") == "avi"
    assert sniff_magic(b"RIFF\x10\x00\x00\x00XXXX") == "riff"
    assert sniff_magic(b"BM\x36\x00") == "bmp"


def test_chunk_audio_real_wav(spark):
    """fake_decode=False over real WAVs: window/hop derive from each
    stream's own sample rate, timestamps are frame-accurate, and the same
    samples at a different rate produce different timing but digests that
    match per-window content."""
    import numpy as np

    from translink.multimodal import ASSET_SCHEMA, chunk_audio, encode_wav

    rng = np.random.default_rng(9)
    pcm = rng.integers(-32768, 32768, size=3200, dtype=np.int16)  # 200ms@16k
    rows = [(0, "audio", encode_wav(pcm, sample_rate=16000), "s"),
            (1, "audio", encode_wav(pcm, sample_rate=8000), "s"),
            (2, "audio", encode_wav(pcm, sample_rate=16000), "dup")]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA).repartition(2)
    got = chunk_audio(assets, window_ms=100, hop_ms=50,
                      fake_decode=False).collect()
    per = {}
    for r in got:
        per.setdefault(r["asset_id"], []).append(r)
    a0 = sorted(per[0], key=lambda r: r["chunk_idx"])
    # 3200 frames @16k = 200ms; hop 50ms=800f -> offsets 0,800,1600,2400
    assert [r["start_ms"] for r in a0] == [0, 50, 100, 150]
    assert a0[0]["end_ms"] == 100
    assert a0[-1]["end_ms"] == 200  # tail window truncates at stream end
    # same bytes at 8k = 400ms of audio -> twice the windows
    assert len(per[1]) == 8
    # planted duplicate: identical chunk digests
    seq = lambda aid: sorted((r["chunk_idx"], r["chunk_hash"]) for r in per[aid])
    assert seq(2) == seq(0)
    # window digests cover decoded PCM: asset 1's FIRST window (100ms@8k =
    # 800 frames) equals asset 0's first window (100ms@16k = 1600 frames)
    # only if content matched — different frame counts, so they differ
    h0 = {r["chunk_idx"]: r["chunk_hash"] for r in per[0]}
    h1 = {r["chunk_idx"]: r["chunk_hash"] for r in per[1]}
    assert h0[0] != h1[0]


def test_chunk_audio_real_rejects_non_wav(spark):
    import pytest

    from translink.multimodal import chunk_audio, synthetic_assets

    assets = synthetic_assets(spark, n=4)
    with pytest.raises(Exception, match="audio codec|WAVE"):
        chunk_audio(assets, fake_decode=False).collect()


def test_assets_from_documents_deterministic_real_decode(spark):
    """Documents-derived asset table: payloads are REAL containers built
    map-side; identical text -> identical payload (multimodal dedup
    composes with text dedup); the real codec path decodes every row."""
    from translink.multimodal import (
        assets_from_documents, chunk_audio, dedup_by_feature,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(0, "hello world " * 20, "en", "a", 240),
         (1, "other text " * 30, "en", "b", 330),
         (2, "hello world " * 20, "en", "c", 240),  # dup of 0
         (3, None, None, "d", 0)],                   # NULL text
        "doc_id long, text string, lang string, source string, n_chars long",
    ).repartition(2)
    feats = extract_features(
        assets_from_documents(docs, media_type="image"), fake_decode=False
    )
    by_id = {r["asset_id"]: r for r in feats.collect()}
    assert len(by_id) == 4
    assert all(r["magic"] == "png" and r["width"] == 24 for r in by_id.values())
    assert by_id[0]["feature_hash"] == by_id[2]["feature_hash"]
    assert by_id[0]["feature_hash"] != by_id[1]["feature_hash"]
    got = {(r["asset_id"], r["cluster_id"])
           for r in dedup_by_feature(feats).collect()}
    assert got == {(0, 0), (2, 0)}
    # audio lane: same docs as WAV PCM; real decode; dup shares digests
    chunks = chunk_audio(
        assets_from_documents(docs, media_type="audio", sample_rate=1000),
        window_ms=100, hop_ms=50, fake_decode=False,
    ).collect()
    per = {}
    for r in chunks:
        per.setdefault(r["asset_id"], []).append((r["chunk_idx"], r["chunk_hash"]))
    assert sorted(per[0]) == sorted(per[2])
    assert len(per[0]) >= 4  # 240 bytes @1kHz = 240ms -> overlapping windows


# ---------------------------------------------------------------------------
# Real baseline JPEG codec (pure-stdlib DCT + Huffman decode_jpeg/encode_jpeg)
# ---------------------------------------------------------------------------


def test_jpeg_round_trip_gray_and_color():
    import numpy as np

    from translink.multimodal import decode_jpeg, encode_jpeg, sniff_magic

    # constant blocks survive quantization exactly
    img = np.full((24, 24), 130, np.uint8)
    p = encode_jpeg(img, quality=90)
    assert sniff_magic(p) == "jpeg"
    assert (decode_jpeg(p) == img).all()
    # smooth gradient at high quality: tight tolerance; lossy, not broken
    gy, gx = np.mgrid[0:32, 0:48]
    img = np.clip(gy * 3 + gx * 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0
    # color (YCbCr 4:4:4 both ways), non-multiple-of-8 dims pad with edge
    img3 = np.dstack([img[:17, :23], img[:17, :23][::-1],
                      np.roll(img[:17, :23], 5, axis=1)])
    out = decode_jpeg(encode_jpeg(img3, quality=92))
    assert out.shape == img3.shape
    assert np.abs(out.astype(int) - img3.astype(int)).mean() < 4.0


def test_jpeg_restart_intervals():
    """DRI + RSTn markers: predictors reset, stream re-byte-aligns —
    the decoder's restart path against encoder-emitted markers."""
    import numpy as np

    from translink.multimodal import decode_jpeg, encode_jpeg

    gy, gx = np.mgrid[0:40, 0:56]
    img = np.clip(gy * 3 + gx * 2, 0, 255).astype(np.uint8)
    for ri in (1, 3):
        out = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=ri))
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 1.0


def test_jpeg_malformed_and_unsupported():
    import numpy as np
    import pytest

    from translink.multimodal import decode_jpeg, encode_jpeg

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_jpeg(img)
    # malformed -> ValueError
    for bad in (
        b"\x00\x00junk",                 # no SOI
        good[:-40],                       # truncated entropy stream
        good[:2] + b"\xff\xd9",           # EOI with no scan
    ):
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    # valid-but-unsupported -> NotImplementedError: progressive SOF2
    prog = bytearray(good)
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))
    # sampling factors above 2 (legal JPEG, out of scope here)
    sub = bytearray(good)
    i = sub.index(b"\xff\xc0")
    sub[i + 11] = 0x33  # first component sampling byte inside SOF0
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(sub))


def test_jpeg_420_subsampling_round_trip():
    """4:2:0 — the real-world default: 2x2 Y blocks per MCU, block-averaged
    chroma, nearest upsampling on decode. Smaller stream, bounded error,
    odd dims handled by MCU padding; composes with restart intervals."""
    import numpy as np

    from translink.multimodal import decode_jpeg, encode_jpeg

    gy, gx = np.mgrid[0:32, 0:48]
    lum = np.clip(gy * 3 + gx * 2, 0, 255).astype(np.uint8)
    img = np.dstack([lum, lum[::-1], np.roll(lum, 7, axis=1)])
    p444 = encode_jpeg(img, quality=92)
    p420 = encode_jpeg(img, quality=92, subsample="420")
    assert len(p420) < len(p444)  # chroma halved both axes
    for payload in (p420,
                    encode_jpeg(img, quality=92, subsample="420",
                                restart_interval=2)):
        out = decode_jpeg(payload)
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 5.0
    # odd dims: MCU padding cropped back
    odd = img[:17, :23]
    out = decode_jpeg(encode_jpeg(odd, quality=92, subsample="420"))
    assert out.shape == odd.shape
    # constant color survives subsampling exactly
    c = np.zeros((16, 16, 3), np.uint8)
    c[..., 0], c[..., 1], c[..., 2] = 200, 64, 30
    assert (decode_jpeg(encode_jpeg(c, quality=92, subsample="420")) == c).all()


def test_extract_features_real_jpeg_distributed(spark):
    import numpy as np

    from translink.multimodal import (
        ASSET_SCHEMA, encode_jpeg, extract_features,
    )

    gy, gx = np.mgrid[0:16, 0:16]
    imgs = [np.clip(gy * (i + 2) + gx, 0, 255).astype(np.uint8)
            for i in range(3)]
    rows = [(i, "image", encode_jpeg(im), "src") for i, im in enumerate(imgs)]
    rows.append((3, "image", encode_jpeg(imgs[0]), "dup"))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA).repartition(2)
    feats = {r["asset_id"]: r
             for r in extract_features(assets, fake_decode=False).collect()}
    assert all(r["magic"] == "jpeg" and r["width"] == 16 for r in feats.values())
    assert feats[0]["feature_hash"] == feats[3]["feature_hash"]
    assert feats[0]["feature_hash"] != feats[1]["feature_hash"]


# ---------------------------------------------------------------------------
# Real AVI Motion-JPEG demux (pure-stdlib decode_avi_mjpeg/encode_avi_mjpeg)
# ---------------------------------------------------------------------------


def test_avi_mjpeg_round_trip_and_taxonomy():
    import numpy as np
    import pytest

    from translink.multimodal import (
        decode_avi_mjpeg, encode_avi_mjpeg, sniff_magic,
    )

    gy, gx = np.mgrid[0:16, 0:16]
    frames = [np.clip(gy * (i + 1) * 3 + gx, 0, 255).astype(np.uint8)
              for i in range(5)]
    p = encode_avi_mjpeg(frames, fps=4.0, quality=92)
    assert sniff_magic(p) == "avi"
    out, fps = decode_avi_mjpeg(p)
    assert fps == 4.0 and len(out) == 5
    for o, f in zip(out, frames):
        assert o.shape == f.shape
        assert np.abs(o.astype(int) - f.astype(int)).mean() < 2.0
    # malformed vs out-of-scope
    for bad in (b"nope", p[:60], b"RIFF\x00\x00\x00\x00WAVEx"):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(bad)


def test_sample_video_frames_real_avi(spark):
    """The real-decode lane: frames demux + JPEG-decode distributed;
    timestamps follow the container's own rate; duplicate payloads share
    decoded-frame digests; non-AVI raises inside the kernel."""
    import numpy as np
    import pytest

    from translink.multimodal import (
        ASSET_SCHEMA, encode_avi_mjpeg, sample_video_frames,
    )

    gy, gx = np.mgrid[0:16, 0:16]
    mk = lambda seed: [np.clip(gy * (seed + i) + gx, 0, 255).astype(np.uint8)
                       for i in range(6)]
    rows = [(i, "video", encode_avi_mjpeg(mk(i + 2), fps=4.0), "src")
            for i in range(3)]
    rows.append((3, "video", encode_avi_mjpeg(mk(2), fps=4.0), "dup"))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA).repartition(2)
    got = sample_video_frames(
        assets, every_nth=2, max_frames=3, fake_decode=False
    ).collect()
    per = {}
    for r in got:
        per.setdefault(r["asset_id"], []).append(r)
    assert all(len(v) == 3 for v in per.values())  # 6 frames / stride 2
    for r in got:
        assert r["frame_idx"] % 2 == 0
        assert r["ts_ms"] == r["frame_idx"] * 250  # 4 fps container rate
    seq = lambda aid: sorted((r["frame_idx"], r["frame_hash"])
                             for r in per[aid])
    assert seq(3) == seq(0)       # duplicate payload -> same decoded frames
    assert seq(0) != seq(1)
    # a WAV payload in the video lane fails as out-of-scope in the kernel
    from translink.multimodal import encode_wav
    bad = spark.createDataFrame(
        [(9, "video", encode_wav(np.zeros(64, np.uint8)), "x")], ASSET_SCHEMA
    )
    with pytest.raises(Exception, match="video codec"):
        sample_video_frames(bad, fake_decode=False).collect()
