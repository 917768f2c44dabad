"""The runtime-compiled JVM in-column decode seam (round-5 directives
3+4): javax.imageio / javax.sound.sampled UDFs over byte columns,
registered via ADD JAR + registerJavaFunction (sources/jvm_udf.py).

All tests gate on the seam being available (JDK compiler present —
this sandbox ships javac 17); on hosts without it the operators raise
the documented RuntimeError and the python backend stands.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def jvm_seam(spark):
    from deduper_spark.sources.jvm_udf import register_jvm_decode_udfs

    if not register_jvm_decode_udfs(spark):
        pytest.skip("no JDK compiler on this host")
    return True


def test_jvm_image_udf_exact_png_parity_and_isolation(spark, jvm_seam):
    from deduper_spark.functions.png import encode_png
    from deduper_spark.operators.multimodal import _unpack_rgb

    rng = np.random.default_rng(5)
    px = rng.integers(0, 255, (13, 9, 3)).astype(np.uint8)
    rows = [("ok", bytearray(encode_png(px))),
            ("poison", bytearray(b"\x89not-a-png")),
            ("nullrow", None)]
    out = {r["id"]: r["rgb"] for r in
           spark.createDataFrame(rows, "id string, b binary")
           .select("id", F.expr("jvm_decode_rgb(b)").alias("rgb"))
           .collect()}
    assert out["poison"] is None and out["nullrow"] is None
    got = _unpack_rgb(bytes(out["ok"]))
    assert np.array_equal(got, px)           # exact pixel parity


def test_jvm_video_backend_parity_and_planted_pairs(spark, jvm_seam):
    """JVM-decoded frame phashes sit within the engine's matching
    thresholds of the Python LUT decoder's (IDCT rounding differs),
    and the end-to-end video near-dup pairs are IDENTICAL."""
    from deduper_spark.operators.multimodal import (
        video_dedup_pairs,
        video_frame_phashes,
    )
    from deduper_spark.synth import make_video_pdf

    df = spark.createDataFrame(make_video_pdf(seed=42, n=16)).cache()
    py = {(r["id"], r["frame_idx"]): r["phash"] for r in
          video_frame_phashes(df, "video_id", "bytes", every_n=2)
          .where("decode_ok").collect()}
    jv = {(r["id"], r["frame_idx"]): r["phash"] for r in
          video_frame_phashes(df, "video_id", "bytes", every_n=2,
                              decode_backend="jvm")
          .where("decode_ok").collect()}
    assert set(py) == set(jv)                # same sampled frames
    dists = [bin(py[k] ^ jv[k]).count("1") for k in py]
    assert max(dists) <= 4, f"max phash divergence {max(dists)}"
    pairs_py = {(r["id_l"], r["id_r"]) for r in
                video_dedup_pairs(df, every_n=2).collect()}
    pairs_jv = {(r["id_l"], r["id_r"]) for r in
                video_dedup_pairs(df, every_n=2,
                                  decode_backend="jvm").collect()}
    assert pairs_py == pairs_jv
    assert pairs_jv                          # planted exact copies found


def test_jvm_video_backend_poison_isolation(spark, jvm_seam):
    from deduper_spark.operators.multimodal import video_frame_phashes

    rows = [("bad", bytearray(b"RIFF\x00\x00\x00\x00AVI not-really"))]
    out = video_frame_phashes(
        spark.createDataFrame(rows, "video_id string, bytes binary"),
        "video_id", "bytes", decode_backend="jvm").collect()
    assert len(out) == 1 and not out[0]["decode_ok"]


def test_jvm_audio_pcm16_wav_exact_parity(spark, jvm_seam):
    """On engine PCM16 WAVs the JVM route and the from-scratch codec
    must agree EXACTLY: same samples => same fingerprint + features."""
    from deduper_spark.operators.multimodal import extract_audio_features
    from deduper_spark.synth import make_audio_pdf

    df = spark.createDataFrame(make_audio_pdf(42, 8)).cache()
    cols = ["sr", "channels", "n_samples", "afp", "rms"]
    py = {r["id"]: tuple(r[c] for c in cols) for r in
          extract_audio_features(df, "audio_id", "bytes").collect()}
    jv = {r["id"]: tuple(r[c] for c in cols) for r in
          extract_audio_features(df, "audio_id", "bytes",
                                 decode_backend="jvm").collect()}
    assert py == jv


def _au_bytes(samples: np.ndarray, sr: int) -> bytes:
    """Sun/NeXT .au container, encoding 3 = 16-bit linear PCM
    big-endian — a format the Python codec rejects and the JDK reads."""
    if samples.ndim == 1:
        samples = samples[:, None]
    data = samples.astype(">i2").tobytes()
    hdr = struct.pack(">4sIIIII", b".snd", 24, len(data), 3, sr,
                      samples.shape[1])
    return hdr + data


def test_jvm_audio_foreign_au_decodes(spark, jvm_seam):
    """A foreign .au blob: python backend isolates it as
    decode_ok=false; the JVM backend decodes it and the fingerprint
    equals the one computed directly from the same samples."""
    from deduper_spark.functions.wav import audio_fingerprint64
    from deduper_spark.operators.multimodal import extract_audio_features

    rng = np.random.default_rng(11)
    samples = (rng.standard_normal((4000, 1)) * 8000).astype(np.int16)
    rows = [("au1", bytearray(_au_bytes(samples, 16000)))]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    # explicit python backend: this assertion is ABOUT the python
    # codec's rejection of the foreign container
    py = extract_audio_features(df, "audio_id", "bytes",
                                decode_backend="python").collect()[0]
    assert not py["decode_ok"]
    jv = extract_audio_features(df, "audio_id", "bytes",
                                decode_backend="jvm").collect()[0]
    assert jv["decode_ok"]
    assert jv["sr"] == 16000 and jv["channels"] == 1
    assert jv["n_samples"] == 4000
    assert jv["afp"] == audio_fingerprint64(samples)


def test_jvm_audio_dedup_pairs_backend(spark, jvm_seam):
    """audio_dedup_pairs over the JVM backend finds the same planted
    gain-invariant pairs as the python backend."""
    from deduper_spark.operators.multimodal import audio_dedup_pairs
    from deduper_spark.synth import make_audio_pdf

    df = spark.createDataFrame(make_audio_pdf(42, 16)).cache()
    py = {(r["id_l"], r["id_r"]) for r in
          audio_dedup_pairs(df).collect()}
    jv = {(r["id_l"], r["id_r"]) for r in
          audio_dedup_pairs(df, decode_backend="jvm").collect()}
    assert py == jv and jv


def test_unknown_backend_raises(spark):
    from deduper_spark.operators.multimodal import (
        extract_audio_features,
        video_frame_phashes,
    )

    df = spark.createDataFrame([("a", bytearray(b"x"))],
                               "id string, bytes binary")
    with pytest.raises(ValueError, match="decode_backend"):
        video_frame_phashes(df, "id", "bytes", decode_backend="nope")
    with pytest.raises(ValueError, match="decode_backend"):
        extract_audio_features(df, "id", "bytes", decode_backend="nope")


def _bmp_bytes(px: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP (bottom-up rows, 4-byte padded)
    — a foreign in-column format the Python codecs reject."""
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        px[y, :, ::-1].tobytes() + b"\x00" * pad     # BGR rows, bottom-up
        for y in range(h - 1, -1, -1))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + info + body


def test_jvm_image_features_foreign_bmp_in_column(spark, jvm_seam):
    """A BMP blob in a table column: python backend isolates it; the
    jvm backend decodes it with exact pixels (phash == phash of the
    same pixels computed directly)."""
    from deduper_spark.functions.phash import phash64
    from deduper_spark.operators.multimodal import extract_image_features

    rng = np.random.default_rng(3)
    px = rng.integers(0, 255, (10, 6, 3)).astype(np.uint8)
    rows = [("bmp1", bytearray(_bmp_bytes(px)))]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    py = extract_image_features(df, "image_id", "bytes").collect()[0]
    assert not py["decode_ok"]
    jv = extract_image_features(df, "image_id", "bytes",
                                decode_backend="jvm").collect()[0]
    assert jv["decode_ok"] and (jv["w"], jv["h"]) == (6, 10)
    assert jv["phash"] == phash64(px)


def test_jvm_image_features_engine_parity_and_fallback(spark, jvm_seam):
    """jvm backend == python backend bit-for-bit on engine PNGs
    (lossless both routes), and dspk blobs (JVM-unreadable) take the
    per-row Python fallback instead of isolating."""
    from deduper_spark.functions.phash import encode_image
    from deduper_spark.functions.png import encode_png
    from deduper_spark.operators.multimodal import extract_image_features

    rng = np.random.default_rng(4)
    px1 = rng.integers(0, 255, (12, 8, 3)).astype(np.uint8)
    px2 = rng.integers(0, 255, (7, 7, 3)).astype(np.uint8)
    rows = [("png1", bytearray(encode_png(px1))),
            ("dspk1", bytearray(encode_image(px2))),
            ("bad", bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    cols = ["decode_ok", "w", "h", "mean_r", "mean_g", "mean_b", "phash"]
    py = {r["id"]: tuple(r[c] for c in cols) for r in
          extract_image_features(df, "image_id", "bytes").collect()}
    jv = {r["id"]: tuple(r[c] for c in cols) for r in
          extract_image_features(df, "image_id", "bytes",
                                 decode_backend="jvm").collect()}
    assert py == jv
    assert jv["dspk1"][0] is True            # fallback decoded it
    assert jv["bad"][0] is False             # poison isolates


def test_auto_backend_resolves_and_matches(spark, jvm_seam):
    """decode_backend="auto" routes to the JVM seam when it registers
    (this host has javac) and produces the same audio features as an
    explicit backend choice — the deploy-path probe-and-route contract
    (r6)."""
    from deduper_spark.operators.multimodal import (
        extract_audio_features,
        resolve_decode_backend,
    )
    from deduper_spark.synth import make_audio_pdf

    df = spark.createDataFrame(make_audio_pdf(42, 4))
    assert resolve_decode_backend(df, "python") == "python"
    assert resolve_decode_backend(df, "jvm") == "jvm"
    assert resolve_decode_backend(df, "auto") == "jvm"  # javac present
    cols = ["sr", "channels", "n_samples", "afp"]
    auto = {r["id"]: tuple(r[c] for c in cols) for r in
            extract_audio_features(df, "audio_id", "bytes",
                                   decode_backend="auto").collect()}
    py = {r["id"]: tuple(r[c] for c in cols) for r in
          extract_audio_features(df, "audio_id", "bytes",
                                 decode_backend="python").collect()}
    assert auto == py
