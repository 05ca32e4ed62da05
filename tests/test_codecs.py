"""Codec unit tests: round-trips, PSNR invariant, phash determinism."""

import numpy as np
import pytest

from newscrawler_spark import codecs, datagen


@pytest.mark.parametrize("w,h", [(16, 16), (32, 64), (128, 128), (24, 16)])
@pytest.mark.parametrize("fmt", ["ppm", "bmp"])
def test_lossless_roundtrip(w, h, fmt):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode(codecs.encode(arr, fmt), fmt), arr)


@pytest.mark.parametrize("w,h", [(16, 16), (64, 32), (128, 128)])
def test_qpng_psnr_above_40(w, h):
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dec = codecs.decode(codecs.encode(arr, "qpng"), "qpng")
    assert codecs.psnr(arr, dec) >= 40.0
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= codecs.QPNG_STEP


def test_psnr_identical_is_inf():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    assert codecs.psnr(a, a) == float("inf")


def test_psnr_rejects_non_uint8():
    # the integer-domain accumulation is uint8-only by contract: float
    # inputs would silently truncate and wide ints can overflow, so the
    # function must fail loudly instead (ADVICE r04)
    a8 = np.zeros((4, 4, 3), dtype=np.uint8)
    for bad in (np.float64, np.float32, np.int32, np.uint16):
        with pytest.raises(TypeError):
            codecs.psnr(a8.astype(bad), a8)
        with pytest.raises(TypeError):
            codecs.psnr(a8, a8.astype(bad))


def test_decode_ppm_returns_readonly_view():
    # decode_ppm's documented contract: a read-only zero-copy view over the
    # payload bytes — in-place mutation must raise, and consumers that need
    # to mutate must copy first (the copy stays correct)
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    dec = codecs.decode_ppm(codecs.encode(arr, "ppm"))
    assert not dec.flags.writeable
    with pytest.raises(ValueError):
        dec[0, 0, 0] = 1
    mut = dec.copy()
    mut[0, 0, 0] ^= 0xFF
    assert np.array_equal(dec, arr)


def test_phash_deterministic_and_int64():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    h1 = codecs.average_phash(arr)
    h2 = codecs.average_phash(arr.copy())
    assert h1 == h2
    assert -(2**63) <= h1 < 2**63


def test_phash_sensitive_to_content():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    b = 255 - a
    assert codecs.average_phash(a) != codecs.average_phash(b)


def test_payload_row_schema_and_determinism():
    r1 = datagen.payload_row(17, 42)
    r2 = datagen.payload_row(17, 42)
    assert r1 == r2
    image_id, data, w, h, fmt, caption, phash = r1
    assert image_id == "img-000000000017"
    assert w in (16, 32, 64, 128) and h in (16, 32, 64, 128)
    assert fmt in codecs.FORMATS
    assert 50 <= len(caption) <= 2100
    arr = codecs.decode(data, fmt)
    assert arr.shape == (h, w, 3)
    assert codecs.average_phash(arr) == phash


def test_expected_pixels_match_encoded():
    for i in (0, 5, 99):
        _, data, w, h, fmt, _, _ = datagen.payload_row(i, 42)
        exp = datagen.expected_pixels(i, 42)
        arr = codecs.decode(data, fmt)
        if fmt == "qpng":
            assert codecs.psnr(exp, arr) >= 40
        else:
            assert np.array_equal(exp, arr)
