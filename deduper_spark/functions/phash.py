"""Image codec + perceptual hash + PSNR kernels (pure NumPy).

These are the per-batch kernels called from vectorized pandas UDFs /
``mapInPandas`` — never per-row Python in the Spark hot path.

Codec surface:
  * REAL PNG decode/encode — from-scratch stdlib zlib + NumPy codec
    (functions/png.py, RFC 2083): the synthetic flagship corpus is
    genuine PNG bytes, and any 8-bit non-interlaced PNG decodes here
    with no image library;
  * REAL baseline JPEG decode/encode — from-scratch NumPy DCT +
    Huffman codec (functions/jpeg.py, ITU-T T.81): the PSNR fidelity
    invariant (>= 40 dB, BASELINE.json input_hint) is exercised
    against a genuine lossy DCT codec;
  * the engine's own deterministic "dspk" container, kept for
    plumbing tests and as the raw fast path:
        b"DSP0" | w:uint32le | h:uint32le | raw RGB uint8   (lossless)
        b"DSP1" | w:uint32le | h:uint32le | quantized RGB   (lossy, q=2)
  * other formats (GIF/TIFF/WebP) remain behind a PIL import-try —
    absent in this container.

phash: the standard public DCT perceptual-hash algorithm — grayscale,
block-mean resize to 32x32, 2-D DCT-II, top-left 8x8 low-frequency
block, threshold at the median → 64-bit fingerprint. Near-duplicate
iff popcount(xor) <= t (engine side: F.bit_count(a ^ b)).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_LOSSLESS = b"DSP0"
MAGIC_LOSSY = b"DSP1"
_LOSSY_Q = 2


# ---------------------------------------------------------------- codec

def encode_image(pixels: np.ndarray, lossy: bool = False) -> bytes:
    """pixels: (h, w, 3) uint8 → container bytes."""
    h, w, _ = pixels.shape
    if lossy:
        payload = ((pixels.astype(np.uint16) + _LOSSY_Q // 2) // _LOSSY_Q * _LOSSY_Q)
        payload = np.clip(payload, 0, 255).astype(np.uint8)
        magic = MAGIC_LOSSY
    else:
        payload = pixels
        magic = MAGIC_LOSSLESS
    return magic + struct.pack("<II", w, h) + payload.tobytes()


def decode_image(buf: bytes) -> np.ndarray:
    """container bytes → (h, w, 3) uint8. dspk and REAL PNG decode
    natively; JPEG (and other formats) fall to the PIL stub."""
    magic = bytes(buf[:4])
    if magic in (MAGIC_LOSSLESS, MAGIC_LOSSY):
        w, h = struct.unpack("<II", bytes(buf[4:12]))
        return np.frombuffer(buf, dtype=np.uint8, offset=12).reshape(h, w, 3)
    if magic == b"\x89PNG":
        from deduper_spark.functions.png import decode_png

        return decode_png(bytes(buf))
    if bytes(buf[:2]) == b"\xff\xd8":
        from deduper_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(bytes(buf))
    # other formats (GIF/TIFF/WebP...) need an image library absent here
    try:
        import io

        from PIL import Image  # noqa: F401 — optional, not installed here

        return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "non-PNG/JPEG/dspk decode requires PIL/pillow (not in this "
            "container); PNG, baseline JPEG, and the deterministic "
            "'dspk' container decode natively"
        ) from exc


# ---------------------------------------------------------------- phash

def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m

_DCT32 = _dct_matrix(32)


def _to_gray_32(pixels: np.ndarray) -> np.ndarray:
    gray = (
        0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
    )
    h, w = gray.shape
    # block-mean resize to 32x32 (works for any dims via index binning)
    yi = (np.arange(h) * 32 // h)
    xi = (np.arange(w) * 32 // w)
    out = np.zeros((32, 32))
    cnt = np.zeros((32, 32))
    np.add.at(out, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), gray)
    np.add.at(cnt, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), 1.0)
    return out / np.maximum(cnt, 1.0)


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64, Spark LongType range)."""
    small = _to_gray_32(pixels)
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])  # exclude DC term from the median
    bits = block > med
    bits[0] = False
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # two's-complement into int64
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))
