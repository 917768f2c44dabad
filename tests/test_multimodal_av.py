"""Audio (RIFF/WAV) + video (RIFF/AVI MJPEG) codecs and the multimodal
Spark operators over them."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from deduper_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    iter_avi_frame_bytes,
)
from deduper_spark.functions.wav import (
    audio_features,
    audio_fingerprint64,
    decode_wav,
    encode_wav,
)
from deduper_spark.synth import (
    expected_audio_pairs,
    make_audio_pdf,
    make_video_pdf,
    video_frame_count,
)


# ---------------------------------------------------------------- WAV codec

def test_wav_roundtrip_byte_determinism():
    rng = np.random.default_rng(3)
    pcm = (rng.uniform(-1, 1, size=(4000, 2)) * 30000).astype(np.int16)
    buf = encode_wav(pcm, 16000)
    samples, sr = decode_wav(buf)
    assert sr == 16000
    np.testing.assert_array_equal(samples, pcm)
    assert encode_wav(samples, sr) == buf           # encode∘decode = id
    assert buf == encode_wav(pcm, 16000)            # run-to-run determinism


def test_wav_decodes_foreign_chunk_order_and_8bit():
    # a conforming-but-quirky WAV some other encoder might emit: LIST
    # chunk first, 8-bit unsigned mono PCM
    u8 = np.array([0, 64, 128, 192, 255], dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"data" + struct.pack("<I", len(u8)) + u8 + b"\x00"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, sr = decode_wav(buf)
    assert sr == 8000 and samples.shape == (5, 1)
    # spec: 8-bit is unsigned, widened to int16 around 0
    assert samples[0, 0] < 0 < samples[4, 0] and samples[2, 0] == 0


@pytest.mark.parametrize("bad", [
    b"nope",
    b"RIFF\x04\x00\x00\x00WAVE",                       # no fmt/data
    b"RIFF\xff\xff\xff\x00WAVE" + b"x" * 10,           # truncated chunk
])
def test_wav_malformed_raises(bad):
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_audio_fingerprint_gain_and_noise_invariance():
    pdf = make_audio_pdf(seed=11, n=40)
    fps = {}
    for _, r in pdf.iterrows():
        s, sr = decode_wav(bytes(r["bytes"]))
        fps[r["audio_id"]] = audio_fingerprint64(s)
    planted = expected_audio_pairs(40)
    for a, b in planted:                       # exact + gain roles: ham 0
        assert bin(fps[a] ^ fps[b]).count("1") == 0, (a, b)
    others = sorted(fps)
    worst = min(
        bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(others) for b in others[i + 1:]
        if (a, b) not in planted
    )
    assert worst > 10                          # clean separation margin


def test_audio_features_scalars():
    t = np.arange(8000) / 8000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    f = audio_features(tone, 8000)
    assert f["rms"] == pytest.approx(20000 / 32768 / np.sqrt(2), rel=1e-3)
    assert f["spectral_centroid"] == pytest.approx(440, abs=5)
    assert f["zcr"] == pytest.approx(2 * 440 / 8000, rel=0.01)


# ---------------------------------------------------------------- AVI codec

def _frames(seed, n, size=64):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(n, 8, 8, 3), dtype=np.uint8)
    return [np.kron(c, np.ones((size // 8, size // 8, 1), dtype=np.uint8))
            for c in coarse]


def test_avi_roundtrip_and_fidelity():
    frames = _frames(5, 4)
    buf = encode_avi_mjpeg(frames, fps=12)
    dec, fps = decode_avi_mjpeg(buf)
    assert fps == 12 and len(dec) == 4
    for orig, d in zip(frames, dec):
        mse = ((orig.astype(float) - d.astype(float)) ** 2).mean()
        psnr = 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)
        assert psnr >= 40.0                    # reference fidelity invariant
    assert buf == encode_avi_mjpeg(frames, fps=12)


def test_avi_zero_transcode_iter_matches_container():
    frames = _frames(6, 5)
    buf = encode_avi_mjpeg(frames, fps=10)
    from deduper_spark.functions.jpeg import decode_jpeg, encode_jpeg

    got = list(iter_avi_frame_bytes(buf))
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    # the iterated bytes ARE the encoder's JPEG output, untouched
    for (_, jpg), f in zip(got, frames):
        assert jpg == encode_jpeg(f, quality=95)
        assert decode_jpeg(jpg).shape == f.shape


@pytest.mark.parametrize("bad", [
    b"nope", b"RIFF\xff\xff\xff\x00AVI " + b"x" * 8,
    b"RIFF\x04\x00\x00\x00AVI ",
])
def test_avi_malformed_raises(bad):
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bad)


# ------------------------------------------------------- Spark operators

def test_extract_audio_features_and_poison_isolation(spark):
    from deduper_spark.operators.multimodal import extract_audio_features

    pdf = make_audio_pdf(seed=42, n=30)
    df = spark.createDataFrame(pdf)
    poison = spark.createDataFrame(
        [("badaudio0", bytearray(b"RIFF not really a wav")),
         ("badaudio1", bytearray(b"\x00\x01\x02"))],
        "audio_id string, bytes binary")
    feats = extract_audio_features(
        df.select("audio_id", "bytes").unionByName(poison),
        "audio_id", "bytes").toPandas().set_index("id")
    for i in range(30):
        row = feats.loc[f"aud{i:09d}"]
        b = i // 10
        assert bool(row["decode_ok"])
        assert row["sr"] == 8000 + 4000 * (b % 3)
        assert row["channels"] == 1 + (b % 2)
        assert row["n_samples"] == row["sr"]
        assert row["duration_s"] == pytest.approx(1.0)
    assert not feats.loc["badaudio0"]["decode_ok"]
    assert not feats.loc["badaudio1"]["decode_ok"]


def test_audio_dedup_pairs_planted_truth(spark):
    from deduper_spark.operators.multimodal import audio_dedup_pairs

    pdf = make_audio_pdf(seed=42, n=50)
    pairs = audio_dedup_pairs(spark.createDataFrame(pdf)).toPandas()
    got = {tuple(sorted((l, r))) for l, r in
           zip(pairs["id_l"], pairs["id_r"])}
    assert got == expected_audio_pairs(50)


def test_sample_video_frames_real_container(spark):
    from deduper_spark.operators.multimodal import sample_video_frames

    pdf = make_video_pdf(seed=42, n=12)
    df = spark.createDataFrame(pdf)
    poison = spark.createDataFrame(
        [("badvid0", bytearray(b"RIFF\x00\x01\x02\x03AVI garbage"))],
        "video_id string, bytes binary")
    out = sample_video_frames(df.select("video_id", "bytes")
                              .unionByName(poison),
                              "video_id", "bytes", every_n=3).toPandas()
    from deduper_spark.functions.jpeg import decode_jpeg

    for i in range(12):
        vid = f"vid{i:09d}"
        sampled = out[out["id"] == vid]
        want = list(range(0, video_frame_count(i), 3))
        assert sorted(sampled["frame_idx"]) == want, vid
        # sampled frame bytes are decodable JPEGs at the right size
        assert decode_jpeg(bytes(sampled.iloc[0]["frame_bytes"])).shape == (64, 64, 3)
    bad = out[out["id"] == "badvid0"]
    assert len(bad) == 1 and not bad.iloc[0]["decode_ok"]


def test_video_frame_phashes_detect_exact_dup(spark):
    from deduper_spark.operators.multimodal import video_frame_phashes

    pdf = make_video_pdf(seed=42, n=10)
    ph = video_frame_phashes(spark.createDataFrame(pdf),
                             "video_id", "bytes", every_n=2).toPandas()
    by_vid = {v: sorted(zip(g["frame_idx"], g["phash"]))
              for v, g in ph.groupby("id")}
    assert by_vid["vid000000006"] == by_vid["vid000000000"]   # planted dup
    distinct = {tuple(v) for v in by_vid.values()}
    assert len(distinct) == 9                                  # others differ


def test_video_dedup_pairs_planted_and_reencoded(spark):
    from deduper_spark.functions.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from deduper_spark.operators.multimodal import video_dedup_pairs

    pdf = make_video_pdf(seed=42, n=30)
    # add a REAL near-dup: clip 0 re-encoded at a lower JPEG quality
    frames, fps = decode_avi_mjpeg(bytes(pdf.iloc[0]["bytes"]))
    import pandas as pd

    re_row = pd.DataFrame([{"video_id": "vid900000000",
                            "bytes": encode_avi_mjpeg(frames, fps=fps,
                                                      quality=85)}])
    df = spark.createDataFrame(
        pd.concat([pdf[["video_id", "bytes"]], re_row], ignore_index=True))
    got = video_dedup_pairs(df, every_n=2).toPandas()
    got_pairs = {tuple(sorted((l, r)))
                 for l, r in zip(got["id_l"], got["id_r"])}
    want = {(f"vid{b*10:09d}", f"vid{b*10+6:09d}") for b in range(3)}
    # the re-encode matches BOTH byte-exact copies of clip 0
    want |= {("vid000000000", "vid900000000"),
             ("vid000000006", "vid900000000")}
    assert got_pairs == want
    # all planted matches cover every co-sampled frame position
    assert (got["matched_frames"] == got[["n_l", "n_r"]].min(axis=1)).all()


def test_video_dedup_pairs_shifted_trimmed_copy(spark):
    """Shift-tolerant matching: a TRIMMED copy (first two frames cut,
    re-encoded at lower quality) aligns at a consistent offset;
    positional matching misses it, offset voting catches it."""
    import pandas as pd

    from deduper_spark.functions.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from deduper_spark.operators.multimodal import (
        video_dedup_pairs,
        video_dedup_pairs_shifted,
    )

    pdf = make_video_pdf(seed=42, n=6)          # 6 distinct base clips
    frames, fps = decode_avi_mjpeg(bytes(pdf.iloc[0]["bytes"]))  # 6 frames
    trimmed = pd.DataFrame([{
        "video_id": "vid900000000",
        "bytes": encode_avi_mjpeg(frames[2:], fps=fps, quality=85),
    }])
    df = spark.createDataFrame(
        pd.concat([pdf[["video_id", "bytes"]], trimmed], ignore_index=True))

    got = video_dedup_pairs_shifted(df, min_matched_frames=3).toPandas()
    rows = {(r["id_l"], r["id_r"]): (r["offset"], r["matched_frames"])
            for _, r in got.iterrows()}
    # trimmed copy aligns to clip 0 at offset -2 with 4 frame votes
    assert rows[("vid000000000", "vid900000000")] == (-2, 4)
    assert len(rows) == 1
    # positional matching cannot see the trim (threshold 80% of 6)
    pos = video_dedup_pairs(df, every_n=1).toPandas()
    assert not ((pos["id_l"] == "vid000000000")
                & (pos["id_r"] == "vid900000000")).any()


def test_mid_container_failure_isolates_whole_blob(spark):
    """An AVI truncated AFTER some valid frames must yield exactly ONE
    decode_ok=false row — not a partial mix of ok frames plus a
    failure row (corrupt containers are all-or-nothing)."""
    import struct

    from deduper_spark.operators.multimodal import (
        sample_video_frames,
        video_frame_phashes,
    )

    pdf = make_video_pdf(seed=42, n=1)
    good = bytes(pdf.iloc[0]["bytes"])
    # corrupt the trailing idx1 chunk's declared size so the walker
    # hits 'truncated chunk' AFTER yielding every frame chunk
    idx1_at = good.rindex(b"idx1")
    bad = (good[:idx1_at + 4]
           + struct.pack("<I", 0x0FFFFFFF) + good[idx1_at + 8:])
    df = spark.createDataFrame(
        [("partial0", bytearray(bad))], "video_id string, bytes binary")
    for op in (sample_video_frames, video_frame_phashes):
        out = op(df, "video_id", "bytes", 1).toPandas()
        assert len(out) == 1 and not out.iloc[0]["decode_ok"], op.__name__


def test_shifted_matching_with_hash_in_video_id(spark):
    """Video ids containing '#' must not break the composite frame-id
    parsing (the frame index is the LAST '#'-segment)."""
    import pandas as pd

    from deduper_spark.operators.multimodal import video_dedup_pairs_shifted

    pdf = make_video_pdf(seed=42, n=3)
    renamed = pdf[["video_id", "bytes"]].copy()
    renamed["video_id"] = ["tenant#a", "tenant#b", "tenant#c"]
    dup = pd.DataFrame([{"video_id": "tenant#a2",
                         "bytes": renamed.iloc[0]["bytes"]}])
    df = spark.createDataFrame(pd.concat([renamed, dup], ignore_index=True))
    got = video_dedup_pairs_shifted(df, min_matched_frames=3).toPandas()
    pairs = {(r["id_l"], r["id_r"]) for _, r in got.iterrows()}
    assert pairs == {("tenant#a", "tenant#a2")}
