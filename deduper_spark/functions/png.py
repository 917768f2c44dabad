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


def encode_png(pixels: np.ndarray, level: int = 6,
               filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 -> deterministic PNG bytes.

    ``filter_type`` (0..4, RFC 2083 §6) is applied to EVERY scanline.
    The default 0 (None) is the engine corpus path; 1-4 (Sub/Up/
    Average/Paeth) exist to build FOREIGN-encoder fixtures — libpng
    defaults to adaptive filtering that is Paeth-heavy, so tests use
    filter_type=4 streams to exercise and measure the per-row decode
    cost real-web PNGs pay. All filter math is vectorized (predictors
    read ORIGINAL neighbor bytes, which equal the reconstructed ones)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unsupported PNG filter type {filter_type}")
    h, w, _ = pixels.shape
    bpp = 3
    stride = w * bpp
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # one filter byte per scanline, then the filtered RGB bytes
    raw = np.empty((h, 1 + stride), dtype=np.uint8)
    raw[:, 0] = filter_type
    px = pixels.reshape(h, stride)
    if filter_type == 0:
        raw[:, 1:] = px
    else:
        p16 = px.astype(np.int16)
        prev = np.zeros_like(p16)
        prev[1:] = p16[:-1]
        left = np.zeros_like(p16)
        left[:, bpp:] = p16[:, :-bpp]
        if filter_type == 1:      # Sub
            f = p16 - left
        elif filter_type == 2:    # Up
            f = p16 - prev
        elif filter_type == 3:    # Average
            f = p16 - ((left + prev) >> 1)
        else:                     # Paeth
            ul = np.zeros_like(p16)
            ul[:, bpp:] = prev[:, :-bpp]
            p = left + prev - ul
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            f = p16 - pred
        raw[:, 1:] = (f % 256).astype(np.uint8)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(filtered: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filters. Rows: (h, 1 + w*bpp) with the filter
    byte leading each row.

    Vectorization by filter-run: consecutive None rows are one bulk
    copy and consecutive Up rows are one uint8 (mod-256) cumsum over
    the row axis — the engine's own encoder emits only those, so the
    bench corpus decodes with zero per-row Python. Sub is a per-lane
    uint8 cumsum. Average/Paeth carry a true sequential dependence
    along x (recon[x] needs recon[x-bpp]), so they run as per-row
    Python-list loops — native ints, not NumPy scalar indexing, which
    measures ~10x faster; real-web (libpng) PNGs are Paeth-heavy, so
    this is the foreign-blob cost path and is covered by the
    filtered-encoder fixtures in tests."""
    stride = w * bpp
    ftypes = filtered[:, 0]
    if ftypes.size and int(ftypes.max()) > 4:
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"unknown PNG filter type {bad}")
    data = filtered[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    y = 0
    while y < h:
        ft = int(ftypes[y])
        if ft == 0:  # None — bulk-copy the whole run of 0-rows
            y2 = y + 1
            while y2 < h and ftypes[y2] == 0:
                y2 += 1
            out[y:y2] = data[y:y2]
            y = y2
        elif ft == 2:  # Up — run of 2-rows is a mod-256 row cumsum
            y2 = y + 1
            while y2 < h and ftypes[y2] == 2:
                y2 += 1
            acc = np.cumsum(data[y:y2], axis=0, dtype=np.uint8)
            if y > 0:
                acc += out[y - 1]          # uint8 wraparound = mod 256
            out[y:y2] = acc
            y = y2
        elif ft == 1:  # Sub: recon[x] = row[x] + recon[x - bpp]
            lanes = data[y].reshape(w, bpp)
            out[y] = np.cumsum(lanes, axis=0,
                               dtype=np.uint8).reshape(stride)
            y += 1
        elif ft == 3:  # Average
            row = data[y].tolist()
            prev = out[y - 1].tolist() if y > 0 else [0] * stride
            rec = [0] * stride
            for x in range(bpp):
                rec[x] = (row[x] + (prev[x] >> 1)) & 255
            for x in range(bpp, stride):
                rec[x] = (row[x] + ((rec[x - bpp] + prev[x]) >> 1)) & 255
            out[y] = rec
            y += 1
        else:  # Paeth
            row = data[y].tolist()
            prev = out[y - 1].tolist() if y > 0 else [0] * stride
            rec = [0] * stride
            for x in range(bpp):
                rec[x] = (row[x] + prev[x]) & 255   # a=c=0 -> pred=b
            for x in range(bpp, stride):
                a = rec[x - bpp]
                b = prev[x]
                c = prev[x - bpp]
                pa = abs(b - c)
                pb = abs(a - c)
                pc = abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                rec[x] = (row[x] + pred) & 255
            out[y] = rec
            y += 1
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
