"""Property-based tests (Hypothesis) for the WAV and AVI codecs:
encode∘decode identity over arbitrary well-formed inputs, not just the
synth corpus's shapes."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deduper_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    iter_avi_frame_bytes,
)
from deduper_spark.functions.wav import decode_wav, encode_wav


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5000),
    ch=st.integers(min_value=1, max_value=4),
    sr=st.sampled_from([8000, 11025, 16000, 22050, 44100, 48000]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, sr, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    buf = encode_wav(pcm, sr)
    samples, sr2 = decode_wav(buf)
    assert sr2 == sr
    np.testing.assert_array_equal(samples, pcm)
    # a second encode of the decoded samples is byte-identical
    assert encode_wav(samples, sr2) == buf


@settings(max_examples=12, deadline=None)
@given(
    n_frames=st.integers(min_value=1, max_value=6),
    side=st.sampled_from([8, 16, 24, 32]),
    fps=st.integers(min_value=1, max_value=60),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_avi_roundtrip_property(n_frames, side, fps, seed):
    rng = np.random.default_rng(seed)
    # low-frequency content so baseline JPEG stays near-lossless and
    # the pixel assertion can be a tight PSNR bound
    coarse = rng.integers(0, 256, size=(n_frames, side // 8, side // 8, 3),
                          dtype=np.uint8)
    frames = [np.kron(c, np.ones((8, 8, 1), dtype=np.uint8))
              for c in coarse]
    buf = encode_avi_mjpeg(frames, fps=fps)
    dec, fps2 = decode_avi_mjpeg(buf)
    assert fps2 == fps and len(dec) == n_frames
    for orig, d in zip(frames, dec):
        assert d.shape == orig.shape
        mse = ((orig.astype(float) - d.astype(float)) ** 2).mean()
        assert mse == 0 or 10 * np.log10(255 ** 2 / mse) >= 40.0
    # frame iteration agrees with full decode on count and order
    assert [i for i, _ in iter_avi_frame_bytes(buf)] == list(range(n_frames))


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_codecs_never_crash_on_garbage(data):
    """Arbitrary bytes either decode or raise ValueError — never any
    other exception (the mapInPandas isolation contract)."""
    for fn in (decode_wav, decode_avi_mjpeg):
        try:
            fn(data)
        except ValueError:
            pass
