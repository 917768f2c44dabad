"""Real WAV (RIFF/PCM) codec — stdlib struct + NumPy, no audio libs.

Spec: RIFF WAVE with a ``fmt `` chunk (format 1 = integer PCM, 8- or
16-bit) and a ``data`` chunk; chunk order is free and unknown chunks
(LIST/INFO/fact/cue) are skipped, per the RIFF container rules. This
gives the multimodal audio operators a genuinely decodable on-disk
format (the audio analogue of functions/png.py / functions/jpeg.py)
instead of a fake container: any standards-conforming PCM WAV produced
elsewhere decodes here, and blobs encoded here play anywhere.

Reference parity note: the reference engine (bmiller1009/deduper) has
no audio path; this exists for the training-data mandate's multimodal
columns. Malformed input raises ValueError so the mapInPandas
isolation path (operators/multimodal.py) can tag decode_ok=false
without killing a 100 TB pass.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 → canonical RIFF/WAVE bytes.

    Deterministic: fixed chunk order (fmt, data), no metadata chunks,
    little-endian PCM16 — byte-identical across runs/platforms.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, ch), got {samples.shape}")
    if samples.dtype != np.int16:
        raise ValueError(f"samples must be int16, got {samples.dtype}")
    n, ch = samples.shape
    if not (1 <= ch <= 8):
        raise ValueError(f"unsupported channel count {ch}")
    data = samples.astype("<i2").tobytes()          # interleaved frames
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", _FMT_PCM, ch, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:                               # RIFF word alignment
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, channels) int16 samples, sample_rate).

    Accepts any chunk order, skips unknown chunks, tolerates the
    common encoder quirk of a RIFF size field shorter than the real
    file. 8-bit PCM (unsigned, per spec) is widened to int16.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, n = 12, len(buf)
    fmt_ck: tuple[int, int, int, int] | None = None   # (code, ch, sr, bits)
    data: bytes | None = None
    while pos + 8 <= n:
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        payload = buf[pos + 8:pos + 8 + size]
        if len(payload) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            code, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", payload[:16])
            fmt_ck = (code, ch, sr, bits)
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size % 2)                  # chunks are word-aligned
    if fmt_ck is None or data is None:
        raise ValueError("missing fmt or data chunk")
    code, ch, sr, bits = fmt_ck
    if code != _FMT_PCM:
        raise ValueError(f"unsupported WAV format code {code} (PCM only)")
    if ch < 1 or sr < 1:
        raise ValueError("invalid fmt chunk")
    if bits == 16:
        usable = len(data) - len(data) % (2 * ch)
        samples = np.frombuffer(data[:usable], dtype="<i2").reshape(-1, ch)
        return samples.astype(np.int16), sr
    if bits == 8:                                     # spec: 8-bit is unsigned
        usable = len(data) - len(data) % ch
        u8 = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, ch)
        return ((u8.astype(np.int16) - 128) << 8), sr
    raise ValueError(f"unsupported bit depth {bits}")


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit energy-delta fingerprint (Haitsma & Kalker, 'A Highly
    Robust Audio Fingerprinting System', ISMIR 2002 — simplified to
    one band): mono-mix, split into 65 equal frames, take the SIGN of
    successive frame-energy deltas. Invariant to gain (scaling leaves
    delta signs unchanged) and to small additive noise; Hamming
    distance on the int64 plugs directly into the engine's
    hamming_candidate_pairs LSH path.
    """
    if samples.ndim == 2:
        mono = samples.mean(axis=1)
    else:
        mono = samples.astype(np.float64)
    n = mono.shape[0]
    if n < 65:
        mono = np.pad(mono, (0, 65 - n))
        n = 65
    # 65 frames -> 64 deltas; trailing remainder samples are dropped
    frame = n // 65
    e = (mono[:frame * 65].reshape(65, frame) ** 2).sum(axis=1)
    bits = (np.diff(e) > 0).astype(np.uint64)
    word = np.uint64(0)
    for b in bits:
        word = (word << np.uint64(1)) | b
    return int(word.astype(np.int64))


def audio_features(samples: np.ndarray, sr: int) -> dict:
    """Deterministic scalar features of a decoded clip (mono-mixed):
    rms / zero-crossing rate on [-1, 1]-normalized samples, spectral
    centroid in Hz via rFFT. Vectorized NumPy only."""
    mono = (samples.mean(axis=1) if samples.ndim == 2
            else samples.astype(np.float64)) / 32768.0
    n = mono.shape[0]
    rms = float(np.sqrt((mono ** 2).mean())) if n else 0.0
    zcr = float((np.signbit(mono[1:]) != np.signbit(mono[:-1])).mean()) if n > 1 else 0.0
    if n > 1:
        mag = np.abs(np.fft.rfft(mono))
        freqs = np.fft.rfftfreq(n, d=1.0 / sr)
        denom = mag.sum()
        centroid = float((freqs * mag).sum() / denom) if denom > 0 else 0.0
    else:
        centroid = 0.0
    return {"rms": round(rms, 6), "zcr": round(zcr, 6),
            "spectral_centroid": round(centroid, 3)}
