"""Real AVI (RIFF) container codec for Motion-JPEG video — stdlib
struct only, frames encoded/decoded by the engine's own baseline JPEG
codec (functions/jpeg.py, ITU-T T.81).

Spec: the Microsoft AVI RIFF form — ``RIFF('AVI ' LIST('hdrl' avih,
LIST('strl' strh strf)) LIST('movi' '00dc'...) idx1)``. The writer
emits a standards-conforming MJPG stream any mainstream player
(ffmpeg/VLC) accepts; the reader walks the RIFF tree, tolerates
unknown chunks, and decodes ``..dc``/``..db`` frame chunks with
decode_jpeg. This closes the last stubbed multimodal codec: video
frame-sampling (operators/multimodal.py:sample_video_frames) now runs
against a genuine multi-frame container.

Reference parity note: the reference engine (bmiller1009/deduper) has
no video path; this exists for the training-data mandate's multimodal
columns. Malformed input raises ValueError so mapInPandas isolation
tags decode_ok=false instead of killing the job.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 95) -> bytes:
    """[(h, w, 3) uint8, ...] → AVI/MJPG bytes. Deterministic: fixed
    chunk layout, frames through the deterministic JPEG encoder."""
    from deduper_spark.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one (h, w, 3) shape")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,            # dwMicroSecPerFrame
        max_sz * fps,                # dwMaxBytesPerSec
        0,                           # dwPaddingGranularity
        _AVIF_HASINDEX,              # dwFlags
        len(jpegs),                  # dwTotalFrames
        0,                           # dwInitialFrames
        1,                           # dwStreams
        max_sz,                      # dwSuggestedBufferSize
        w, h,                        # dwWidth, dwHeight
        0, 0, 0, 0,                  # dwReserved[4]
    )
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII4h",
                          0,          # dwFlags
                          0, 0,       # wPriority, wLanguage
                          0,          # dwInitialFrames
                          1, fps,     # dwScale, dwRate -> fps
                          0,          # dwStart
                          len(jpegs),  # dwLength (frames)
                          max_sz,     # dwSuggestedBufferSize
                          10_000,     # dwQuality
                          0,          # dwSampleSize
                          0, 0, w, h))  # rcFrame
    strf = struct.pack("<IiiHH4sIiiII",
                       40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    idx, off = b"", 4                # offsets relative to 'movi' fourcc
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", idx)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(buf: bytes):
    """Yield (chunk_id, payload) DEPTH-FIRST in container order — the
    single RIFF walker behind both decode_avi_mjpeg and
    iter_avi_frame_bytes, so frame ORDER cannot diverge between the
    decode and zero-transcode paths (interleaved AVIs nest frames in
    'rec ' sublists between direct movi chunks; a breadth-first walk
    would renumber them)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    end = 8 + struct.unpack("<I", buf[4:8])[0]
    if end > len(buf):
        raise ValueError("truncated AVI stream")

    # explicit-stack DFS, NOT recursion: a crafted blob of thousands of
    # nested LIST headers must exhaust the CHUNK, not the interpreter
    # stack — a RecursionError would escape the operators' isolation
    # contract (they catch ValueError only) and kill the whole task.
    # Each stack frame is a mutable [pos, hi] cursor into one LIST body.
    stack: list[list[int]] = [[12, end]]
    while stack:
        frame = stack[-1]
        pos, hi = frame
        if pos + 8 > hi:
            stack.pop()
            continue
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body_lo, body_hi = pos + 8, pos + 8 + size
        if body_hi > hi:
            raise ValueError(f"truncated {cid!r} chunk")
        frame[0] = body_hi + (size % 2)
        if cid == b"LIST":
            stack.append([body_lo + 4, body_hi])    # skip list kind
        else:
            yield cid, buf[body_lo:body_hi]


def decode_avi_mjpeg(buf: bytes) -> tuple[list[np.ndarray], int]:
    """AVI bytes → ([(h, w, 3) uint8 frames], fps). Only the frame
    chunks and the 'avih' header matter; anything else (INFO/JUNK/
    idx1) is skipped, per the RIFF rules."""
    from deduper_spark.functions.jpeg import decode_jpeg

    fps = 0
    frames: list[np.ndarray] = []
    for cid, payload in _iter_chunks(buf):
        if cid == b"avih" and len(payload) >= 4:
            (uspf,) = struct.unpack("<I", payload[:4])
            fps = round(1_000_000 / uspf) if uspf else 0
        elif cid[2:4] in (b"dc", b"db"):
            frames.append(decode_jpeg(payload))
    if not frames:
        raise ValueError("AVI stream contains no video frames")
    return frames, fps


def iter_avi_frame_bytes(buf: bytes):
    """Yield (frame_idx, jpeg_bytes) WITHOUT decoding — the zero-
    transcode path for frame sampling: sampled frames ship as the
    contained JPEG chunks untouched. Same walker (and therefore the
    same frame order) as decode_avi_mjpeg."""
    idx = 0
    for cid, payload in _iter_chunks(buf):
        if cid[2:4] in (b"dc", b"db"):
            yield idx, payload
            idx += 1
