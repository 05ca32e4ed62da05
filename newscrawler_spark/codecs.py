"""Pure-numpy image codecs + perceptual hash.

The sandbox has no PIL/cv2/imageio, so the image payload column (`bytes` in
the input table `(image_id, bytes, w, h, fmt, caption, phash)`) is encoded
with codecs we own end-to-end:

- ``ppm``  — binary PPM (P6), lossless, byte-round-trips.
- ``bmp``  — 24-bit uncompressed BI_RGB (bottom-up, BGR, 4-byte row pad),
             lossless, byte-round-trips.
- ``qpng`` — our synthetic *lossy* codec: uniform quantization (step=4) of
             RGB samples + zlib deflate. Max per-sample error is step/2=2,
             so worst-case MSE ≤ 4 → PSNR ≥ 10·log10(255²/4) ≈ 42 dB, which
             satisfies the ≥40 dB lossy-format invariant by construction
             while still exercising a real decoded-pixel-allclose check.

These run inside pandas UDFs (vectorized over Arrow batches, one numpy call
per image — no per-row Python beyond the loop over the batch, which is the
same batch-loop shape pandas UDFs always have).

Reference analog: the HTML fetch+extract stage at
/root/reference/utils/article_extractor.py:205-410 — here the "document" is
an image payload and "extraction" is decode+validate.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

QPNG_MAGIC = b"QPNG"
QPNG_STEP = 4

FORMATS = ("ppm", "bmp", "qpng")


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a P6 PPM.

    Returns a READ-ONLY zero-copy view aliasing ``data`` (in-place ops on
    the result raise ValueError; copy first to mutate), and the view keeps
    the whole payload — header included — alive for the array's lifetime.
    Chosen deliberately: the decode path is DRAM-bandwidth bound and the
    avoided raster copy is a measured multi-core scaling win.
    """
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, whitespace, w, h, maxval, single whitespace, raster.
    # Locate the header newlines instead of split(): split would copy the
    # multi-hundred-KB raster twice (the decode path is DRAM-bandwidth
    # bound, so every avoided copy shows up in multi-core scaling).
    try:
        i1 = data.index(b"\n")
        i2 = data.index(b"\n", i1 + 1)
        i3 = data.index(b"\n", i2 + 1)
    except ValueError:
        raise ValueError("truncated PPM header") from None
    w, h = (int(x) for x in data[i1 + 1 : i2].split())
    if data[i2 + 1 : i3] != b"255":
        raise ValueError("unsupported maxval")
    need = w * h * 3
    if len(data) - (i3 + 1) < need:
        raise ValueError("truncated PPM raster")
    # zero-copy view over the payload bytes (read-only is fine downstream)
    return np.frombuffer(data, dtype=np.uint8, count=need, offset=i3 + 1).reshape(
        h, w, 3
    )


# ------------------------------------------------------------- BMP (24-bit)


def encode_bmp(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    row_pad = (-(w * 3)) % 4
    stride = w * 3 + row_pad
    image_size = stride * h
    # bottom-up, BGR
    bgr = np.ascontiguousarray(arr[::-1, :, ::-1], dtype=np.uint8)
    if row_pad:
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        raster = padded.tobytes()
    else:
        raster = bgr.tobytes()
    file_size = 14 + 40 + image_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    return header + info + raster


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if hdr_size < 40 or bpp != 24:
        raise ValueError("unsupported BMP variant")
    stride = (w * 3 + 3) & ~3
    need = stride * abs(h)
    raster = np.frombuffer(data[offset : offset + need], dtype=np.uint8).reshape(abs(h), stride)
    bgr = raster[:, : w * 3].reshape(abs(h), w, 3)
    rgb = bgr[:, :, ::-1]
    if h > 0:  # bottom-up
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ----------------------------------------------------------- QPNG (lossy)


def encode_qpng(arr: np.ndarray, step: int = QPNG_STEP) -> bytes:
    h, w, _ = arr.shape
    q = np.round(arr.astype(np.float32) / step).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), level=6)
    return QPNG_MAGIC + struct.pack("<IIB", w, h, step) + payload


def decode_qpng(data: bytes) -> np.ndarray:
    if data[:4] != QPNG_MAGIC:
        raise ValueError("not a QPNG")
    w, h, step = struct.unpack_from("<IIB", data, 4)
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)
    # uint16 dequant with in-place ops (vs the old int32 astype/clip chain):
    # half the temp traffic, identical values — q*step is non-negative so
    # only the upper clip can engage
    t = q.astype(np.uint16)
    t *= step
    np.minimum(t, 255, out=t)
    return t.astype(np.uint8)


# --------------------------------------------------------------- dispatch

_ENCODERS = {"ppm": encode_ppm, "bmp": encode_bmp, "qpng": encode_qpng}
_DECODERS = {"ppm": decode_ppm, "bmp": decode_bmp, "qpng": decode_qpng}


def encode(arr: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](arr)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


# ----------------------------------------------------------------- metrics


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images.

    uint8-only by contract: the integer-domain accumulation below is exact
    for byte images but would truncate float inputs and can overflow wide
    integer dtypes, so non-uint8 inputs fail loudly.
    """
    if a.dtype != np.uint8 or b.dtype != np.uint8:
        raise TypeError(f"psnr expects uint8 images, got {a.dtype}/{b.dtype}")
    # integer-domain MSE: one int32 temp instead of two float64 images plus
    # a float64 square (~6x less memory traffic). Bit-identical result —
    # squared byte diffs are exact in float64 and the pairwise float sum of
    # exact integers below 2^53 equals the integer sum.
    d = a.astype(np.int32)
    np.subtract(d, b, out=d)
    np.multiply(d, d, out=d)
    mse = float(d.sum(dtype=np.int64)) / d.size
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def average_phash(arr: np.ndarray) -> int:
    """Deterministic 64-bit average hash (8x8 block-mean, DCT-free).

    w and h are multiples of 8 in the synthetic corpus, so block-mean
    pooling is exact. Bit i (row-major over the 8x8 grid) is set when the
    block mean exceeds the global mean. Returned as a *signed* int64 so it
    round-trips through Spark's LongType.
    """
    # sum-then-divide == astype(float64).mean(axis=2) bit-for-bit (byte sums
    # are exact in float64), without materializing a float64 copy of the
    # whole image first
    gray = arr.sum(axis=2, dtype=np.float64)
    gray /= 3.0
    h, w = gray.shape
    bh, bw = h // 8, w // 8
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
