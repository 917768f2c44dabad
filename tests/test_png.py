"""Real PNG codec tests (deduper_spark/functions/png.py) — pure
stdlib zlib + NumPy, no image library."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from deduper_spark.functions.png import PNG_SIGNATURE, decode_png, encode_png


def _rand_img(seed, h=64, w=64):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_roundtrip_exact():
    img = _rand_img(1)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_roundtrip_non_square():
    img = _rand_img(2, h=17, w=31)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_deterministic_bytes():
    img = _rand_img(3)
    assert encode_png(img) == encode_png(img)


def test_decode_all_filter_types():
    """Hand-build PNGs using every scanline filter; decode must undo
    each (encoders in the wild emit Sub/Up/Average/Paeth freely)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w, bpp = 6, 5, 3
    for ftype in (0, 1, 2, 3, 4):
        rows = []
        prev = np.zeros(w * bpp, dtype=np.int64)
        for y in range(h):
            cur = img[y].reshape(-1).astype(np.int64)
            if ftype == 0:
                filt = cur
            elif ftype == 1:
                left = np.concatenate([np.zeros(bpp, dtype=np.int64),
                                       cur[:-bpp]])
                filt = (cur - left) % 256
            elif ftype == 2:
                filt = (cur - prev) % 256
            elif ftype == 3:
                filt = np.zeros_like(cur)
                for x in range(w * bpp):
                    left = cur[x - bpp] if x >= bpp else 0
                    filt[x] = (cur[x] - (left + prev[x]) // 2) % 256
            else:
                filt = np.zeros_like(cur)
                for x in range(w * bpp):
                    a = cur[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if y > 0 and x >= bpp else 0
                    c = c if y > 0 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    filt[x] = (cur[x] - pred) % 256
            rows.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
            prev = cur

        def chunk(tag, payload):
            return (struct.pack(">I", len(payload)) + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        buf = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"".join(rows)))
               + chunk(b"IEND", b""))
        assert np.array_equal(decode_png(buf), img), f"filter {ftype}"


def test_decode_rgba_and_gray():
    import numpy as np

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    # RGBA: alpha dropped
    rgba = np.random.default_rng(5).integers(0, 256, size=(4, 4, 4),
                                             dtype=np.uint8)
    raw = np.concatenate(
        [np.concatenate([[0], rgba[y].reshape(-1)]) for y in range(4)]
    ).astype(np.uint8)
    buf = (PNG_SIGNATURE
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw.tobytes()))
           + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(buf), rgba[:, :, :3])

    # grayscale: broadcast to RGB
    gray = np.random.default_rng(6).integers(0, 256, size=(3, 7),
                                             dtype=np.uint8)
    raw = np.concatenate(
        [np.concatenate([[0], gray[y]]) for y in range(3)]
    ).astype(np.uint8)
    buf = (PNG_SIGNATURE
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 3, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw.tobytes()))
           + chunk(b"IEND", b""))
    out = decode_png(buf)
    assert out.shape == (3, 7, 3)
    assert np.array_equal(out[:, :, 0], gray)


def test_corrupt_rejected():
    img = _rand_img(7, 8, 8)
    buf = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope" + bytes(buf[4:]))
    buf[40] ^= 0xFF  # flip a payload byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(buf))
