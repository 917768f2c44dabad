"""Deterministic synthetic image+caption corpus (FIXTURES.md §5).

Every field is a pure function of ``(seed, i)`` so the same table can be
built driver-side (pandas, for unit tests) or distributed
(``spark.range(n).mapInPandas``, for benchmarks) with identical bytes.

Schema (BASELINE.json input_hint):
    image_id:string, bytes:binary, w:int, h:int, fmt:string,
    caption:string, phash:long

Planted duplicate classes, per block of 10 consecutive indices
(block b = indices 10b..10b+9):
    role 0-5: distinct base rows
    role 6:   EXACT dup of role 0      (byte-identical bytes + caption)
    role 7:   RE-ENCODE of role 1      (lossy re-encode, PSNR>=40, same caption)
    role 8:   CAPTION-NEAR of role 2   (same image, paraphrased caption,
                                        shingle Jaccard >= ~0.8)
    role 9:   SUBSTRING of role 3      (long caption containing role 3's
                                        caption verbatim; same image)

Golden sidecar ``expected_clusters(seed, n)`` gives (image_id,
cluster_id = min image_id of the planted clique) — the oracle for
dup-pair recall >= 0.99 (reference golden pattern: DeduperTest.kt:46-83).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from deduper_spark.functions.phash import decode_image, encode_image, phash64
from deduper_spark.functions.png import encode_png

IMG = 64          # base image side (pixels)
BLOCK = 10

_VOCAB = [
    # deterministic ~160-word vocabulary for captions
    "sunset", "mountain", "river", "forest", "city", "skyline", "bridge",
    "ancient", "modern", "colorful", "quiet", "bustling", "snowy", "golden",
    "harbor", "lighthouse", "meadow", "valley", "canyon", "desert", "island",
    "beach", "wave", "cloud", "storm", "rainbow", "mist", "dawn", "dusk",
    "street", "market", "temple", "castle", "garden", "fountain", "plaza",
    "cat", "dog", "horse", "bird", "deer", "fox", "whale", "eagle", "owl",
    "red", "blue", "green", "amber", "violet", "crimson", "teal", "ivory",
    "stone", "wooden", "glass", "steel", "brick", "marble", "copper",
    "small", "large", "tiny", "vast", "narrow", "wide", "tall", "deep",
    "photo", "view", "scene", "landscape", "portrait", "closeup", "aerial",
    "under", "over", "beside", "between", "behind", "near", "along",
    "winter", "summer", "autumn", "spring", "morning", "evening", "night",
    "rain", "snow", "fog", "wind", "sunlight", "moonlight", "shadow",
    "path", "trail", "road", "railway", "tunnel", "gate", "tower", "dome",
    "lake", "pond", "waterfall", "glacier", "cliff", "dune", "reef",
    "flower", "tree", "grass", "moss", "fern", "pine", "oak", "maple",
    "old", "new", "rustic", "sleek", "ornate", "plain", "vivid", "pale",
    "festival", "parade", "ceremony", "concert", "museum", "gallery",
    "boat", "ship", "train", "bicycle", "carriage", "tram", "ferry",
    "child", "artist", "farmer", "sailor", "dancer", "musician", "crowd",
    "reflection", "silhouette", "panorama", "texture", "pattern", "detail",
    "hill", "field", "orchard", "vineyard", "farm", "barn", "mill",
    "crystal", "frozen", "burning", "floating", "hidden", "distant",
]


def _base_index(i: int) -> tuple[int, str]:
    """Map index → (index of the base row it duplicates, dup class)."""
    b, r = divmod(i, BLOCK)
    if r == 6:
        return b * BLOCK + 0, "exact"
    if r == 7:
        return b * BLOCK + 1, "reencode"
    if r == 8:
        return b * BLOCK + 2, "caption_near"
    if r == 9:
        return b * BLOCK + 3, "substring"
    return i, "base"


def _rng(seed: int, base_i: int, tag: int) -> np.random.Generator:
    return np.random.default_rng([seed, base_i, tag])


def _pixels(seed: int, base_i: int) -> np.ndarray:
    rng = _rng(seed, base_i, 0)
    # low-frequency random pattern: 8x8 upsampled x8 so phash separates
    # distinct images while staying stable under mild quantization
    coarse = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    return np.kron(coarse, np.ones((IMG // 8, IMG // 8, 1), dtype=np.uint8))


def _caption_tokens(seed: int, base_i: int) -> list[str]:
    rng = _rng(seed, base_i, 1)
    n_tok = int(rng.integers(14, 31))
    idx = rng.integers(0, len(_VOCAB), size=n_tok)
    return [_VOCAB[j] for j in idx]


def make_row(seed: int, i: int, lossy_fmt: str = "png",
             container: str = "png") -> dict:
    """``container`` picks the lossless wrapper for base/exact/caption/
    substring rows: "png" (default — real RFC 2083 blobs, zlib decode
    cost) or "dspk" (the engine's raw header+RGB container, the
    round-2 corpus) — the knob exists so the bench can decompose codec
    decode cost from pipeline cost on otherwise identical corpora."""
    if container not in ("png", "dspk"):
        raise ValueError(f"unsupported container {container!r}")
    base_i, klass = _base_index(i)
    pixels = _pixels(seed, base_i)
    tokens = _caption_tokens(seed, base_i)
    enc_lossless = encode_png if container == "png" else encode_image
    lossless_fmt = container

    # every blob is a REAL codec output; role 7's lossy re-encode is
    # either a deterministic quantization (q=2, max abs error 1 ->
    # PSNR ~48 dB >= the 40 dB reference invariant) inside a fresh PNG
    # container (default — the vectorized bench path), or, with
    # ``lossy_fmt="jpeg"``, a REAL baseline JPEG at quality 95
    # (functions/jpeg.py — 8x8 DCT + quant + Huffman): the fidelity
    # audit then runs against a genuine lossy DCT codec
    if klass == "reencode":
        if lossy_fmt == "jpeg":
            from deduper_spark.functions.jpeg import encode_jpeg

            buf = encode_jpeg(pixels, quality=95)
            fmt = "jpg"
        else:
            quant = ((pixels.astype(np.uint16) + 1) // 2 * 2)
            quant = np.clip(quant, 0, 255).astype(np.uint8)
            buf = enc_lossless(quant)
            fmt = lossless_fmt
        ph = phash64(decode_image(buf))
        caption = " ".join(tokens)
    elif klass == "caption_near":
        buf = enc_lossless(pixels)
        fmt = lossless_fmt
        ph = phash64(pixels)
        extra = _caption_tokens(seed, i)[:2]
        caption = " ".join(tokens + extra)          # append → high Jaccard
    elif klass == "substring":
        buf = enc_lossless(pixels)
        fmt = lossless_fmt
        ph = phash64(pixels)
        pre = _caption_tokens(seed, i)[:6]
        post = _caption_tokens(seed, i)[6:12]
        caption = " ".join(pre) + " " + " ".join(tokens) + " " + " ".join(post)
    else:  # base / exact
        buf = enc_lossless(pixels)
        fmt = lossless_fmt
        ph = phash64(pixels)
        caption = " ".join(tokens)

    return {
        "image_id": f"img{i:09d}",
        "bytes": buf,
        "w": IMG,
        "h": IMG,
        "fmt": fmt,
        "caption": caption,
        "phash": ph,
    }


def make_pdf(seed: int, n: int, start: int = 0,
             lossy_fmt: str = "png", container: str = "png") -> pd.DataFrame:
    rows = [make_row(seed, i, lossy_fmt, container)
            for i in range(start, start + n)]
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype("int32")
    df["h"] = df["h"].astype("int32")
    df["phash"] = df["phash"].astype("int64")
    return df


SPARK_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def make_df(spark, seed: int, n: int, partitions: int | None = None,
            lossy_fmt: str = "png", container: str = "png"):
    """Distributed generation: spark.range → mapInPandas(make_row).

    This is how the bench input is produced — the generator itself
    scales with the cluster instead of bottlenecking on the driver.
    """
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), 2000):
                ids = pdf["id"].iloc[lo : lo + 2000]
                yield pd.DataFrame(
                    [make_row(seed, int(i), lossy_fmt, container)
                     for i in ids])

    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, schema=SPARK_SCHEMA)
    )


def expected_clusters(seed: int, n: int) -> pd.DataFrame:
    """Golden sidecar: (image_id, cluster_id = min image_id of clique)."""
    rows = []
    for i in range(n):
        base_i, _ = _base_index(i)
        cluster_base = base_i if base_i < n else i
        rows.append(
            {"image_id": f"img{i:09d}", "cluster_id": f"img{cluster_base:09d}"}
        )
    return pd.DataFrame(rows)


def expected_dup_pairs(seed: int, n: int) -> set[tuple[str, str]]:
    """All intra-clique pairs (id_l < id_r) — recall denominator."""
    cl = expected_clusters(seed, n)
    pairs: set[tuple[str, str]] = set()
    for _, grp in cl.groupby("cluster_id"):
        ids = sorted(grp["image_id"])
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                pairs.add((ids[a], ids[b]))
    return pairs


# ---------------------------------------------------------------------------
# Deterministic synthetic AUDIO corpus (multimodal mandate — audio
# columns). Same design as the image corpus: every field is a pure
# function of (seed, i), planted duplicate roles per block of 10:
#     role 0-5: distinct base clips
#     role 6:   EXACT dup of role 0 (byte-identical WAV)
#     role 7:   GAIN re-encode of role 1 (x0.6 amplitude — same
#               energy-delta fingerprint, near-dup class)
# Block-level params are index-derivable (the driver oracle's planted
# truth): sample_rate = 8000 + 4000*(block%3), channels = 1+(block%2),
# n_samples = sample_rate (exactly 1 s).
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sr int, channels int, "
    "n_samples int, fmt string"
)


def _audio_base_index(i: int) -> tuple[int, str]:
    b, r = divmod(i, BLOCK)
    if r == 6:
        return b * BLOCK + 0, "exact"
    if r == 7:
        return b * BLOCK + 1, "gain"
    return i, "base"


def _audio_wave(seed: int, base_i: int, sr: int, ch: int) -> np.ndarray:
    """float64 (sr, ch) in [-1, 1]: 3 random tones under a strongly
    varying 65-segment amplitude envelope. The envelope guarantees
    adjacent fingerprint-frame energies differ by far more than int16
    quantization noise, so the energy-delta signs (functions/wav.py
    audio_fingerprint64) survive gain re-encoding bit-exactly."""
    rng = _rng(seed, base_i, 7)
    n = sr
    t = np.arange(n) / sr
    freqs = rng.uniform(100.0, sr / 2.0 - 200.0, size=3)
    amps = rng.uniform(0.1, 0.3, size=3)
    wave = sum(a * np.sin(2 * np.pi * f * t) for a, f in zip(amps, freqs))
    env = rng.uniform(0.15, 1.0, size=65)
    frame = n // 65
    env_samples = np.repeat(env, frame)
    env_samples = np.pad(env_samples, (0, n - env_samples.shape[0]),
                         mode="edge")
    wave = wave * env_samples
    wave = wave / np.abs(wave).max()
    if ch == 1:
        return wave[:, None]
    right = np.roll(wave, sr // 100) * 0.9       # 10 ms delayed echo ch.
    return np.stack([wave, right], axis=1)


def make_audio_row(seed: int, i: int) -> dict:
    from deduper_spark.functions.wav import encode_wav

    b = i // BLOCK
    sr = 8000 + 4000 * (b % 3)
    ch = 1 + (b % 2)
    base_i, klass = _audio_base_index(i)
    wave = _audio_wave(seed, base_i, sr, ch)
    gain = 0.6 if klass == "gain" else 1.0
    pcm = np.clip(wave * gain * 32000.0, -32768, 32767).astype(np.int16)
    return {
        "audio_id": f"aud{i:09d}",
        "bytes": encode_wav(pcm, sr),
        "sr": sr,
        "channels": ch,
        "n_samples": sr,
        "fmt": "wav",
    }


def make_audio_pdf(seed: int, n: int, start: int = 0) -> pd.DataFrame:
    df = pd.DataFrame([make_audio_row(seed, i) for i in range(start, start + n)])
    for c in ("sr", "channels", "n_samples"):
        df[c] = df[c].astype("int32")
    return df


def make_audio_df(spark, seed: int, n: int, partitions: int | None = None):
    """Distributed audio-corpus generation (same pattern as make_df)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), 500):
                ids = pdf["id"].iloc[lo : lo + 500]
                yield pd.DataFrame(
                    [make_audio_row(seed, int(i)) for i in ids])

    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, schema=AUDIO_SCHEMA)
    )


def expected_audio_pairs(n: int) -> set[tuple[str, str]]:
    """Planted audio dup pairs (id_l < id_r): role 6↔0 (exact) and
    role 7↔1 (gain) per complete block."""
    pairs: set[tuple[str, str]] = set()
    for i in range(n):
        base_i, klass = _audio_base_index(i)
        if klass != "base" and base_i < n:
            pairs.add((f"aud{base_i:09d}", f"aud{i:09d}"))
    return pairs


# ---------------------------------------------------------------------------
# Deterministic synthetic VIDEO corpus (multimodal mandate — video
# columns). Real MJPEG-in-AVI blobs (functions/avi.py over the T.81
# JPEG codec). Pure function of (seed, i); per block of 10:
#     role 0-5: distinct base clips
#     role 6:   EXACT dup of role 0 (byte-identical AVI)
# Block-level params are index-derivable (driver-oracle planted truth):
# n_frames = 6 + 2*(block%3), fps = 10, frames are the base image
# rolled 4 px per frame (motion), so every sampled frame decodes.
# ---------------------------------------------------------------------------

VIDEO_SCHEMA = (
    "video_id string, bytes binary, n_frames int, fps int, w int, h int, "
    "fmt string"
)


def _video_base_index(i: int) -> tuple[int, str]:
    b, r = divmod(i, BLOCK)
    if r == 6:
        return b * BLOCK + 0, "exact"
    return i, "base"


def video_frame_count(i: int) -> int:
    return 6 + 2 * ((i // BLOCK) % 3)


def make_video_row(seed: int, i: int) -> dict:
    from deduper_spark.functions.avi import encode_avi_mjpeg

    base_i, _klass = _video_base_index(i)
    n_frames = video_frame_count(i)
    pixels = _pixels(seed, base_i)
    frames = [np.roll(pixels, 4 * k, axis=1) for k in range(n_frames)]
    buf = encode_avi_mjpeg(frames, fps=10)
    return {
        "video_id": f"vid{i:09d}",
        "bytes": buf,
        "n_frames": n_frames,
        "fps": 10,
        "w": IMG,
        "h": IMG,
        "fmt": "avi",
    }


def make_video_pdf(seed: int, n: int, start: int = 0) -> pd.DataFrame:
    df = pd.DataFrame([make_video_row(seed, i) for i in range(start, start + n)])
    for c in ("n_frames", "fps", "w", "h"):
        df[c] = df[c].astype("int32")
    return df


def make_video_df(spark, seed: int, n: int, partitions: int | None = None):
    """Distributed video-corpus generation (same pattern as make_df)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), 200):
                ids = pdf["id"].iloc[lo : lo + 200]
                yield pd.DataFrame(
                    [make_video_row(seed, int(i)) for i in ids])

    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, schema=VIDEO_SCHEMA)
    )


TRIM_ROLE = 2          # i % 5 == 2 clips get a trimmed near-copy
TRIM_FRAMES = 2        # leading frames cut from the copy
TRIM_QUALITY = 85      # copies re-encode at lower quality (lossy drift)


def make_trimmed_video_row(seed: int, i: int) -> dict:
    """A TRIMMED near-copy of base clip ``i``: the first TRIM_FRAMES
    frames are cut and the remainder re-encoded at lower JPEG quality
    — the planted truth for shift-tolerant video matching. Frame j of
    the copy equals frame j+TRIM_FRAMES of the base (modulo lossy
    re-encode), so the copy aligns at offset -TRIM_FRAMES with
    n_frames - TRIM_FRAMES frame votes. Copy ids sort AFTER their
    base ('vid9' + 8 digits > 'vid0...'), matching the pair order the
    operator canonicalizes to."""
    from deduper_spark.functions.avi import encode_avi_mjpeg

    base_i, _klass = _video_base_index(i)
    n_frames = video_frame_count(i)
    pixels = _pixels(seed, base_i)
    frames = [np.roll(pixels, 4 * k, axis=1)
              for k in range(TRIM_FRAMES, n_frames)]
    buf = encode_avi_mjpeg(frames, fps=10, quality=TRIM_QUALITY)
    return {
        "video_id": f"vid9{i:08d}",
        "bytes": buf,
        "n_frames": n_frames - TRIM_FRAMES,
        "fps": 10,
        "w": IMG,
        "h": IMG,
        "fmt": "avi",
    }


def make_shifted_video_df(spark, seed: int, n: int,
                          partitions: int | None = None):
    """make_video_df plus trimmed near-copies of every i%5==TRIM_ROLE
    clip (ids 'vid9' + 8 digits; requires n < 10**8 so copy ids cannot
    collide with base ids). Planted truth stays index-derivable: the
    base roles are unchanged, copies align at offset -TRIM_FRAMES."""
    if n >= 10 ** 8:
        raise ValueError("n must stay below 10**8 (copy-id namespace)")
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), 200):
                ids = pdf["id"].iloc[lo : lo + 200]
                rows = [make_video_row(seed, int(i)) for i in ids]
                rows += [make_trimmed_video_row(seed, int(i))
                         for i in ids if int(i) % 5 == TRIM_ROLE]
                yield pd.DataFrame(rows)

    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, schema=VIDEO_SCHEMA)
    )
