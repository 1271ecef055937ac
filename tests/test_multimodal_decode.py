"""Unit tests for the REAL uncompressed-format decoders (round 4):
synth -> decode round trips with exact array equality, spec-edge cases
(row padding widths, odd sample counts), and the NotImplementedError
contract for compressed formats."""

from __future__ import annotations

import numpy as np
import pytest

from distributed_graph_db_c_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    synth_bmp,
    synth_wav,
)


@pytest.mark.parametrize("doc_id", [0, 1, 7, 63, 64, 299, 12345])
def test_wav_roundtrip_exact(doc_id):
    samples, rate = decode_audio(synth_wav(doc_id))
    a = 100 + doc_id % 900
    n = 200 + doc_id % 64
    assert rate == 8000 + (doc_id % 4) * 4000
    assert samples.shape == (n, 1)
    expect = np.where(np.arange(n) % 2 == 0, a, -a)
    assert np.array_equal(samples[:, 0], expect)


@pytest.mark.parametrize("doc_id", list(range(13)))  # every padding width
def test_bmp_roundtrip_exact(doc_id):
    # w = 4 + doc_id % 13 covers w*3 % 4 in all residues -> all pad widths
    img = decode_image(synth_bmp(doc_id))
    w = 4 + doc_id % 13
    h = 4 + doc_id % 11
    assert img.shape == (h, w, 3)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert np.array_equal(img[:, :, 0], (x * 7 + y * 13 + doc_id) % 256)
    assert np.array_equal(img[:, :, 1], (x * 11 + y * 3 + 2 * doc_id) % 256)
    assert np.array_equal(img[:, :, 2], (x * 5 + y * 17 + 3 * doc_id) % 256)


def test_bmp_orientation_not_symmetric():
    # row 0 differs from the last row for any asymmetric pattern, so a
    # decoder that forgets the bottom-up flip cannot pass the roundtrip
    img = decode_image(synth_bmp(5))
    assert not np.array_equal(img[0], img[-1])


def test_compressed_formats_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # JPEG SOI
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04" + b"\x00" * 64)  # MP3 with ID3 tag


def test_wav_8bit_unsigned_centering():
    import struct

    # hand-build an 8-bit mono WAV: samples 0, 128, 255 -> centered -128, 0, 127
    data = bytes([0, 128, 255])
    blob = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    samples, rate = decode_audio(blob)
    assert rate == 8000
    assert samples[:, 0].tolist() == [-128, 0, 127]


def test_png_roundtrip_all_filter_types():
    """Encoder filters forward, decoder inverts — every PNG filter type
    (None/Sub/Up/Average/Paeth) appears across these doc_ids, and every
    pixel must survive the compress->inflate->unfilter round trip."""
    import numpy as np

    from distributed_graph_db_c_spark.operators.multimodal import (
        decode_image,
        synth_png,
    )

    for doc_id in [0, 1, 2, 3, 4, 17, 59, 123, 255]:
        img = decode_image(synth_png(doc_id))
        w, h = 4 + doc_id % 12, 5 + doc_id % 9
        assert img.shape == (h, w, 3)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        exp = np.stack(
            np.broadcast_arrays(
                (x * 3 + y * 19 + doc_id) % 256,
                (x * 13 + y * 7 + 5 * doc_id) % 256,
                (x * 17 + y * 11 + 7 * doc_id) % 256,
            ),
            axis=-1,
        ).astype(np.uint8)
        assert (img == exp).all()


def test_unsupported_image_formats_raise():
    import pytest as _pytest

    from distributed_graph_db_c_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # JPEG magic, no PIL here


def test_png_unsupported_color_type_raises():
    """Grayscale / palette / 16-bit PNGs must refuse loudly, not
    mis-decode."""
    import struct
    import zlib

    import pytest as _pytest

    from distributed_graph_db_c_spark.operators.multimodal import decode_image

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    magic = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # grayscale
    raw = zlib.compress(bytes([0, 1, 2, 0, 3, 4]))
    blob = magic + chunk(b"IHDR", ihdr) + chunk(b"IDAT", raw) + chunk(b"IEND", b"")
    with _pytest.raises(NotImplementedError, match="color_type"):
        decode_image(blob)


def test_ahash_dedup_pairs_match_bruteforce(spark):
    """The banded aHash pair join must equal brute-force Hamming <= 3
    over all pairs of the synthesized near-dup corpus, and the planted
    within-group near-dups must actually surface (not vacuous)."""
    import itertools

    import pyspark.sql.functions as F

    from distributed_graph_db_c_spark.operators.multimodal import (
        ahash64,
        decode_image,
        synth_bmp_near_dup,
    )
    from distributed_graph_db_c_spark.queries.multimodal import mm_ahash_dedup_pairs

    n = 60
    hashes = {d: ahash64(decode_image(synth_bmp_near_dup(d))) for d in range(n)}
    expect = {}
    for a, b in itertools.combinations(range(n), 2):
        hd = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
        if hd <= 3:
            expect[(a, b)] = hd
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm_ahash_dedup_pairs(spark, "/root/testdata/sf0.001")
        .filter((F.col("doc_a") < n) & (F.col("doc_b") < n))
        .collect()
    }
    assert got == expect
    # the fixture plants near-dups: some within-group pair must be found
    assert any(a // 5 == b // 5 for a, b in expect), "fixture vacuous"


def test_ahash64_small_frames_upscale_instead_of_crash():
    """h<8 or w<8 used to crash the 8x8 block reshape (advice r5); now
    the frame is upscaled nearest-neighbor, and upscaling is hash-
    preserving for frames already block-constant (each source pixel
    becomes an equal-weight block, so every block comparison against the
    mean is unchanged)."""
    import numpy as np

    from distributed_graph_db_c_spark.operators.multimodal import ahash64

    rng = np.random.default_rng(3)
    small = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8).astype(np.uint8)
    assert isinstance(ahash64(small), int)  # no ValueError
    # 1x1 and 8x1 degenerate shapes
    assert ahash64(np.full((1, 1, 3), 7, np.uint8)) == 0  # all-equal blocks
    assert isinstance(ahash64(np.arange(24, dtype=np.uint8).reshape(8, 1, 3)), int)
    # nearest-neighbor upscale of an exact 8x8 image reproduces its hash
    base = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8).astype(np.uint8)
    up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert ahash64(base) == ahash64(up)
    with np.testing.assert_raises(ValueError):
        ahash64(np.zeros((0, 4, 3), np.uint8))


def test_spectral_features_match_explicit_dft(spark):
    """audio_spectral_features differential: recompute centroid/
    bandwidth/rolloff for a handful of clips with an EXPLICIT O(n^2)
    DFT summation (independent of np.fft) and require agreement to
    1e-6 relative; plus the analytic pin — a period-2 square wave's
    spectrum concentrates at Nyquist, so centroid ~ rate/2 and
    bandwidth ~ 0 for even-length clips."""
    import math

    import numpy as np
    import pandas as pd

    from distributed_graph_db_c_spark.operators.multimodal import (
        audio_spectral_features,
        decode_audio,
        synth_wav,
    )

    ids = [0, 1, 7, 42, 123]
    df = spark.createDataFrame(
        [(i, bytearray(synth_wav(i))) for i in ids], "doc_id long, blob binary"
    )
    got = {r["doc_id"]: r for r in audio_spectral_features(df).collect()}
    for i in ids:
        samples, rate = decode_audio(synth_wav(i))
        mono = samples[:, 0].astype(float)
        n = len(mono)
        # explicit DFT at the rFFT bin frequencies
        ks = np.arange(n // 2 + 1)
        mag = np.array(
            [
                abs(sum(mono[t] * complex(math.cos(-2 * math.pi * k * t / n),
                                          math.sin(-2 * math.pi * k * t / n))
                        for t in range(n)))
                for k in ks
            ]
        )
        freq = ks * rate / n
        total = mag.sum()
        centroid = (freq * mag).sum() / total
        bandwidth = math.sqrt((((freq - centroid) ** 2) * mag).sum() / total)
        rolloff = freq[int(np.searchsorted(np.cumsum(mag), 0.85 * total))]
        r = got[i]
        # tolerance scales with the frequency AXIS, not the value: a
        # pure tone's bandwidth is the sqrt of a cancellation-dominated
        # near-zero sum, where relative error is meaningless
        assert abs(r["centroid_hz"] - centroid) <= 1e-6 * rate
        assert abs(r["bandwidth_hz"] - bandwidth) <= 1e-5 * rate
        assert abs(r["rolloff85_hz"] - rolloff) <= 1e-6 * rate
        # analytic: even-length period-2 square wave = pure Nyquist tone
        if n % 2 == 0:
            assert abs(r["centroid_hz"] - rate / 2) < 1e-6 * rate
            assert r["bandwidth_hz"] < 1e-6 * rate
