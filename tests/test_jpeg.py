"""Real baseline JPEG codec (functions/jpeg.py) — roundtrip fidelity,
determinism goldens, malformed-input isolation, and the full dedup
pipeline over a corpus whose lossy re-encodes are genuine JPEGs (the
PSNR>=40dB invariant from BASELINE.json input_hint exercised against a
real DCT codec, not a stand-in quantizer)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from deduper_spark.functions.jpeg import decode_jpeg, encode_jpeg
from deduper_spark.functions.phash import decode_image, phash64, psnr_db


def _synth_img(seed: int = 7, side: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    return np.kron(coarse, np.ones((side // 8, side // 8, 1), dtype=np.uint8))


def test_roundtrip_psnr_and_phash():
    img = _synth_img()
    for q, floor in ((95, 50.0), (90, 50.0), (75, 45.0)):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert dec.shape == img.shape
        assert psnr_db(img, dec) >= floor, q
        assert bin(phash64(img) ^ phash64(dec)).count("1") <= 4, q


def test_quality_monotone_size():
    img = _synth_img(seed=11)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (95, 75, 50, 25)]
    assert sizes == sorted(sizes, reverse=True)


def test_odd_dimensions_and_444_subsample_modes():
    rng = np.random.default_rng(3)
    img = np.kron(rng.integers(0, 256, (7, 9, 3), dtype=np.uint8),
                  np.ones((5, 6, 1), dtype=np.uint8))  # 35 x 54
    for sub, floor in ((False, 35.0), (True, 20.0)):
        # 4:2:0 legitimately loses fidelity on color edges misaligned
        # with the 2x2 grid — only the shape/crop contract is strict
        dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert dec.shape == img.shape
        assert psnr_db(img, dec) >= floor, sub


def test_subsample_smooth_content_high_fidelity():
    # smooth gradients: 4:2:0 must be near-lossless (chroma plane
    # aligned — a half-pixel shift would tank this assertion)
    y, x = np.mgrid[0:48, 0:80]
    img = np.stack([(x * 3) % 256, ((y * 2 + x) % 256) // 2 + 60,
                    (255 - x * 2) % 256], -1).astype(np.uint8) // 4 * 4
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert psnr_db(img, dec) >= 40.0
    # hard color edge on the 2x2 grid stays exactly in place
    split = np.zeros((32, 32, 3), np.uint8)
    split[:, :16] = (200, 30, 30)
    split[:, 16:] = (30, 30, 200)
    dec2 = decode_jpeg(encode_jpeg(split, quality=95, subsample=True))
    assert dec2[16, 15, 0] > 150 and dec2[16, 16, 0] < 80


def test_deterministic_bytes_golden():
    # byte-for-byte determinism (the synth corpus requires bytes to be
    # a pure function of (seed, i)); the md5 pin catches silent codec
    # drift — update ONLY on an intentional format change
    img = _synth_img(seed=42)
    a = encode_jpeg(img, quality=95)
    assert a == encode_jpeg(img, quality=95)
    assert hashlib.md5(a).hexdigest() == (
        "ed8fe4e5592bdda4d26d553067667587"
    )


def test_decode_image_routes_jpeg():
    img = _synth_img(seed=5)
    buf = encode_jpeg(img, quality=90)
    assert np.array_equal(decode_image(buf), decode_jpeg(buf))


def test_malformed_inputs_raise_valueerror():
    img = _synth_img(seed=9)
    buf = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(buf[: len(buf) // 3])          # truncated mid-scan
    with pytest.raises(ValueError):                # progressive rejected
        import struct
        sof2 = (b"\xff\xd8"
                + struct.pack(">HH", 0xFFC2, 11)
                + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        decode_jpeg(sof2)


def test_pipeline_with_real_jpeg_lossy_roles(spark):
    """Full dedup pipeline where role-7 re-encodes are REAL JPEGs:
    cluster assignments still exactly match the planted golden, and
    the exhaustive PSNR verification passes the 40 dB bar."""
    from deduper_spark.config import DedupConfig
    from deduper_spark.pipeline import DedupPipeline
    from deduper_spark.synth import expected_clusters, make_pdf

    n = 100
    pdf = make_pdf(42, n, lossy_fmt="jpeg")
    assert (pdf["fmt"] == "jpg").sum() == n // 10   # one role-7 per block
    corpus = spark.createDataFrame(pdf)
    res = DedupPipeline(DedupConfig()).run(spark, corpus)
    got = {r["image_id"]: r["cluster_id"] for r in res.clusters.collect()}
    want = dict(expected_clusters(42, n)[["image_id", "cluster_id"]]
                .itertuples(index=False, name=None))
    assert got == want
    assert res.report.success


def test_chunked_lookahead_equals_single_chunk(monkeypatch):
    """The chunked entropy-window refill (bounded-memory decode of
    large foreign scans) is bit-for-bit equivalent to decoding with
    one chunk covering the whole stream: shrink the chunk so a small
    image's scan crosses several refills and compare pixels."""
    from deduper_spark.functions import jpeg as J

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (120, 104, 3), dtype=np.uint8)
    buf = J.encode_jpeg(img, quality=95)   # noise -> long entropy scan
    want = J.decode_jpeg(buf)

    # margin must stay below the chunk; 1<<16 bits forces refills on a
    # scan this size while one MCU (<~24k bits) still fits the margin
    monkeypatch.setattr(J, "_PEEK_CHUNK_BITS", 1 << 16)
    monkeypatch.setattr(J, "_REFILL_MARGIN_BITS", 1 << 15)
    assert 8 * len(buf) > (1 << 16)        # the scan really spans chunks
    got = J.decode_jpeg(buf)
    assert np.array_equal(got, want)

    # truncation contract survives chunking
    with pytest.raises(ValueError):
        J.decode_jpeg(buf[: len(buf) // 2])
