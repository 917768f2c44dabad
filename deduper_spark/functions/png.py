"""Minimal real PNG codec — pure stdlib zlib + NumPy (RFC 2083).

Closes the "PNG decode is stubbed" gap without any image library:
the container has no PIL/cv2, but PNG is just zlib-compressed
filtered scanlines plus CRC-framed chunks, all implementable with
stdlib ``zlib`` and vectorized NumPy.

Supported:
  * decode: 8-bit RGB (color type 2) and RGBA (6, alpha dropped),
    grayscale (0) broadcast to RGB; all five scanline filters
    (None/Sub/Up/Average/Paeth); no interlace.
  * encode: 8-bit RGB, filter 0 (None) or 2 (Up) per scanline —
    deterministic output for a given input (fixed zlib level), which
    the synth corpus requires (bytes are a pure function of (seed,i)).

Baseline JPEG has its own real codec (functions/jpeg.py, DCT +
Huffman); the deterministic quantize-then-PNG re-encode remains the
default lossy role in the bench corpus because its decode path is
fully vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 -> deterministic PNG bytes (filter 0 rows)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # one filter byte (0 = None) per scanline, then raw RGB
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(filtered: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters. Rows: (h, 1 + w*bpp) with the filter
    byte leading each row. Sub is a vectorized per-lane cumsum mod 256;
    Up is a running row accumulation; Average/Paeth fall back to a
    per-pixel loop (rare in practice; our encoder never emits them)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(filtered[y, 0])
        row = filtered[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride,
                                                                 dtype=np.int64)
        if ftype == 0:  # None
            out[y] = row.astype(np.uint8)
        elif ftype == 1:  # Sub: recon[x] = row[x] + recon[x - bpp]
            lanes = row.reshape(w, bpp)
            out[y] = (np.cumsum(lanes, axis=0) % 256).astype(
                np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            out[y] = ((row + prev) % 256).astype(np.uint8)
        elif ftype == 3:  # Average
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + (left + prev[x]) // 2) % 256
            out[y] = rec.astype(np.uint8)
        elif ftype == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) % 256
            out[y] = rec.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. RGB/RGBA/grayscale, no interlace."""
    if bytes(buf[:8]) != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    n = len(buf)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", bytes(buf[pos:pos + 4]))
        if pos + 12 + length > n:
            # poisoned/truncated blobs must surface as ValueError so the
            # multimodal decode-isolation path (decode_ok=false) catches
            # them instead of a raw struct.error killing the job
            raise ValueError("truncated PNG chunk")
        tag = bytes(buf[pos + 4:pos + 8])
        payload = bytes(buf[pos + 8:pos + 8 + length])
        if (zlib.crc32(tag + payload) & 0xFFFFFFFF) != struct.unpack(
            ">I", bytes(buf[pos + 8 + length:pos + 12 + length])
        )[0]:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit depth {depth}, interlace {interlace}); "
            f"only 8-bit non-interlaced images are supported"
        )
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream corrupt: {exc}") from exc
    expected = h * (1 + w * channels)
    if raw.size != expected:
        raise ValueError(
            f"PNG data size {raw.size} != expected {expected}"
        )
    recon = _unfilter(raw.reshape(h, 1 + w * channels), h, w, channels)
    img = recon.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    if channels == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img
