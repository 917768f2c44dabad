"""Round-4 regression tests: ADVICE fixes (AVI walker recursion,
zero-frame AVI isolation, streaming-fuzzy empty first batch) plus the
Hamming salt recall guarantee and codec fast paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from deduper_spark.functions.avi import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    iter_avi_frame_bytes,
)


def _nested_lists_avi(depth: int) -> bytes:
    """RIFF/AVI whose body is `depth` nested LIST chunks and nothing
    else — the recursion bomb from the round-3 advice."""
    body = b""
    for _ in range(depth):
        payload = b"list" + body            # 4-byte list kind + body
        body = b"LIST" + struct.pack("<I", len(payload)) + payload
    full = b"AVI " + body
    return b"RIFF" + struct.pack("<I", len(full)) + full


def test_avi_deep_nesting_no_recursion_error():
    # ~4000 nested LISTs would blow the default recursion limit many
    # times over with a recursive walker; the iterative one just walks
    blob = _nested_lists_avi(4000)
    assert list(iter_avi_frame_bytes(blob)) == []
    with pytest.raises(ValueError, match="no video frames"):
        decode_avi_mjpeg(blob)


def test_avi_deep_nesting_isolates_in_operator(spark):
    from deduper_spark.operators.multimodal import video_frame_phashes

    df = spark.createDataFrame(
        [("bomb", bytearray(_nested_lists_avi(4000)))],
        "video_id string, bytes binary")
    rows = video_frame_phashes(df, "video_id", "bytes").collect()
    assert [(r["id"], r["decode_ok"]) for r in rows] == [("bomb", False)]


def test_zero_frame_avi_yields_decode_ok_false(spark):
    from deduper_spark.operators.multimodal import (
        sample_video_frames,
        video_frame_phashes,
    )

    # structurally valid AVI, zero frame chunks
    empty = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    frames = encode_avi_mjpeg(
        [np.zeros((16, 16, 3), np.uint8)], fps=5)
    df = spark.createDataFrame(
        [("empty0", bytearray(empty)), ("ok0", bytearray(frames))],
        "video_id string, bytes binary")

    got = {(r["id"], r["decode_ok"])
           for r in sample_video_frames(df, "video_id", "bytes").collect()}
    assert got == {("empty0", False), ("ok0", True)}

    got = {(r["id"], r["decode_ok"])
           for r in video_frame_phashes(df, "video_id", "bytes").collect()}
    assert got == {("empty0", False), ("ok0", True)}


def test_stream_fuzzy_empty_first_batch_does_not_brick(spark, tmp_path):
    """An empty first micro-batch must not leave a _SUCCESS-only ledger
    dir that fails every later batch with UNABLE_TO_INFER_SCHEMA."""
    import time

    from deduper_spark.streaming.fuzzy import stream_fuzzy_dedup

    src = tmp_path / "src"
    src.mkdir()
    schema = "image_id string, phash long"

    def wait(q):
        q.awaitTermination(120)
        for _ in range(100):
            if not q.isActive:
                return
            time.sleep(0.2)

    # batch 1: a parquet file with ZERO rows
    spark.createDataFrame([], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    args = (spark, str(src), schema, str(tmp_path / "tgt"),
            str(tmp_path / "ledger"), str(tmp_path / "ckpt"),
            "image_id", "phash")
    wait(stream_fuzzy_dedup(*args))

    # batch 2: real rows — must ingest cleanly (P kept, near-dup dropped)
    P = 0x0123456789ABCDEF
    spark.createDataFrame([("a1", P), ("a2", P ^ 1)], schema) \
        .coalesce(1).write.mode("append").parquet(str(src))
    wait(stream_fuzzy_dedup(*args))
    tgt = spark.read.parquet(str(tmp_path / "tgt"))
    assert {r["image_id"] for r in tgt.collect()} == {"a1"}

    # batch 3: near-dup of the retained row — the ledger written after
    # the empty batch must be readable and effective
    spark.createDataFrame([("b1", P ^ 2)], schema) \
        .coalesce(1).write.mode("append").parquet(str(src))
    wait(stream_fuzzy_dedup(*args))
    assert spark.read.parquet(str(tmp_path / "tgt")).count() == 1


# ------------------------------------------------------------------
# Hamming hot-bucket recall guarantee (round-3 "What's wrong" #1)
# ------------------------------------------------------------------

def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _i64(v: int) -> int:
    v &= 0xFFFFFFFFFFFFFFFF
    return v - (1 << 64) if v >= (1 << 63) else v


def test_hamming_hot_bucket_pigeonhole_pair_survives_salting(spark):
    """A pair at Hamming = n_bands-1 shares exactly ONE band bucket
    (pigeonhole). If that bucket is hot (1,000 members > max_bucket_size
    200), scalar salting could split the pair; the triangle-block
    decomposition must still recover it."""
    from deduper_spark.operators.lsh import (
        hamming_candidate_pairs,
        int64_band_buckets,
    )

    fa = 0xAAAA5555111234
    fb = fa ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)   # Hamming 3, only
    #                                               band 0 (low 16) shared
    assert _hamming(fa, fb) == 3

    rows = [("pairA", fa), ("pairB", fb)]
    # 1,000 fillers share band-0 bucket 0x1234 but sit far (>3) from
    # the pair and from each other in the high 48 bits
    rng = np.random.default_rng(99)
    seen = {fa >> 16, fb >> 16}
    i = 0
    while len(rows) < 1002:
        hi = int(rng.integers(0, 1 << 48))
        if all(_hamming(hi << 16, s << 16) > 8 for s in seen):
            rows.append((f"fill{i:04d}", _i64((hi << 16) | 0x1234)))
            seen.add(hi)
            i += 1
    df = spark.createDataFrame(rows, "id string, fp long")
    buckets = int64_band_buckets(df, "id", "fp", band_bits=16,
                                 family="fp", max_hamming=3)
    pairs, dropped = hamming_candidate_pairs(buckets, max_bucket_size=200)
    got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    assert ("pairA", "pairB") in got, (
        "max-Hamming pair split by hot-bucket salting — the pigeonhole "
        "recall guarantee is violated")
    assert dropped.count() == 0


def test_hamming_triangle_blocks_equal_unsalted_ground_truth(spark):
    """On one 300-member bucket, the salted (triangle-block) result must
    EQUAL the exact all-pairs ground truth — salting redistributes work,
    never changes the answer."""
    from deduper_spark.operators.lsh import (
        hamming_candidate_pairs,
        int64_band_buckets,
    )

    rng = np.random.default_rng(7)
    fps = [(f"r{i:03d}", _i64(int(rng.integers(0, 1 << 44)) << 20))
           for i in range(300)]
    # same low-16 bucket for band 0; random elsewhere
    fps = [(rid, _i64((v & ~0xFFFF) | 0x00FF)) for rid, v in fps]
    truth = {
        (a, b)
        for i, (a, va) in enumerate(fps)
        for b, vb in fps[i + 1:]
        if _hamming(va, vb) <= 12
    }
    df = spark.createDataFrame(fps, "id string, fp long")
    buckets = int64_band_buckets(df, "id", "fp", band_bits=16,
                                 family="fp", max_hamming=12)
    pairs, _ = hamming_candidate_pairs(buckets, max_bucket_size=50)
    got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    # candidate generation is bucket-limited: every truth pair sharing a
    # band bucket must appear; band-0 bucket is shared by ALL rows, so
    # candidate coverage is total and got must equal truth exactly
    assert got == truth


def test_streaming_vs_batch_chained_dup_parity_boundary(spark, tmp_path):
    """Pins the documented scope boundary (streaming/fuzzy.py: no
    cross-batch transitive closure): a Hamming chain A~B~C split across
    micro-batches keeps {A, C} in streaming (C is not near the RETAINED
    representative A), while the batch pipeline's connected components
    keeps only A. Both are correct under their declared semantics; this
    test is the executable statement of exactly where they diverge."""
    import time

    from deduper_spark.operators.cc import connected_components
    from deduper_spark.operators.lsh import (
        hamming_candidate_pairs,
        int64_band_buckets,
    )
    from deduper_spark.streaming.fuzzy import stream_fuzzy_dedup

    A = 0x0F0F0F0F0F0F0F0F
    B = A ^ 0b111                  # Hamming(A,B) = 3
    C = B ^ (0b111 << 20)          # Hamming(B,C) = 3, Hamming(A,C) = 6
    schema = "image_id string, phash long"

    # ---- batch semantics: one corpus, transitive closure keeps only A
    df = spark.createDataFrame([("A", A), ("B", B), ("C", C)], schema)
    buckets = int64_band_buckets(df, "image_id", "phash", band_bits=16,
                                 family="fp", max_hamming=3)
    pairs, _ = hamming_candidate_pairs(buckets)
    comps = connected_components(pairs.select("id_l", "id_r"))
    batch_survivors = {"A", "B", "C"} - {
        r["id"] for r in comps.where("id != cluster_id").collect()}
    assert batch_survivors == {"A"}

    # ---- streaming semantics: A|B|C in three micro-batches
    src = tmp_path / "src"
    src.mkdir()

    def wait(q):
        q.awaitTermination(120)
        for _ in range(100):
            if not q.isActive:
                return
            time.sleep(0.2)

    args = (spark, str(src), schema, str(tmp_path / "tgt"),
            str(tmp_path / "ledger"), str(tmp_path / "ckpt"),
            "image_id", "phash")
    for rid, fp in (("A", A), ("B", B), ("C", C)):
        spark.createDataFrame([(rid, fp)], schema).coalesce(1) \
            .write.mode("append").parquet(str(src))
        wait(stream_fuzzy_dedup(*args))
    stream_survivors = {
        r["image_id"]
        for r in spark.read.parquet(str(tmp_path / "tgt")).collect()}
    # B dropped (near retained A); C RETAINED (compared against A only —
    # the dropped B is not in the ledger). THE divergence, pinned:
    assert stream_survivors == {"A", "C"}
    assert stream_survivors != batch_survivors


# ------------------------------------------------------------------
# PNG foreign-encoder (filtered scanline) fixtures + unfilter parity
# ------------------------------------------------------------------

def test_png_all_filter_types_roundtrip():
    """Foreign-encoder fixtures: every RFC 2083 filter type (incl.
    libpng-favored Paeth) encodes and decodes back to identical pixels,
    so the foreign-blob decode path is exercised, not just isolated."""
    from deduper_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(3)
    # gradient + noise: representative filter deltas, not degenerate
    grad = np.linspace(0, 255, 48 * 37 * 3).reshape(48, 37, 3)
    px = np.clip(grad + rng.normal(0, 12, grad.shape),
                 0, 255).astype(np.uint8)
    for ft in (0, 1, 2, 3, 4):
        buf = encode_png(px, filter_type=ft)
        got = decode_png(buf)
        assert np.array_equal(got, px), f"filter {ft} roundtrip broken"


def test_png_mixed_filter_runs_roundtrip():
    """Streams mixing per-row filter types (real adaptive encoders do)
    must reconstruct exactly — covers run boundaries of the run-length
    vectorized unfilter (None/Up runs abutting Paeth rows)."""
    import struct as _struct
    import zlib as _zlib

    from deduper_spark.functions.png import (
        PNG_SIGNATURE,
        _chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (40, 23, 3)).astype(np.uint8)
    # build filtered scanlines row-by-row with a fixed filter pattern by
    # reusing the vectorized single-filter encoder per row (predictors
    # only look one row back, so row-local re-encode is exact)
    pattern = [0, 0, 2, 2, 2, 4, 3, 1, 2, 0]
    h, w, _ = px.shape
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    for y in range(h):
        ft = pattern[y % len(pattern)]
        two = px[max(y - 1, 0):y + 1]
        if y == 0:
            two = px[0:1]
        sub = encode_png(np.ascontiguousarray(two), filter_type=ft)
        # decode the filtered bytes of the LAST row of the 2-row image
        # from its IDAT (deterministic layout: len+IHDR, len+IDAT ...)
        pos = 8 + 12 + 13                     # sig + IHDR chunk
        (ln,) = _struct.unpack(">I", sub[pos:pos + 4])
        idat = _zlib.decompress(sub[pos + 8:pos + 8 + ln])
        rows = np.frombuffer(idat, np.uint8).reshape(two.shape[0],
                                                     1 + w * 3)
        raw[y] = rows[-1]
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    buf = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", _zlib.compress(raw.tobytes(), 6))
           + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(buf), px)


def test_stream_fuzzy_hot_ledger_bucket_guard(spark, tmp_path):
    """Ledger-join sizing/salt guard (round-3 'What's missing' #3):
    a hot ledger bucket (many mutually-distant fingerprints sharing one
    16-bit band value) is salted — the membership test stays exact and
    metrics report the salting; beyond ledger_bucket_cap the bucket is
    dropped from the join and a probe whose ONLY shared band is capped
    is admitted (bounded, metered recall trade)."""
    import time

    from deduper_spark.streaming.fuzzy import stream_fuzzy_dedup

    schema = "image_id string, phash long"

    def wait(q):
        q.awaitTermination(180)
        for _ in range(100):
            if not q.isActive:
                return
            time.sleep(0.2)

    # 300 fingerprints sharing band-0 bucket 0x00AB, mutually far apart
    rng = np.random.default_rng(11)
    fills, seen = [], set()
    while len(fills) < 300:
        hi = int(rng.integers(0, 1 << 48))
        if all(_hamming(hi, s) > 8 for s in seen):
            fills.append(_i64((hi << 16) | 0x00AB))
            seen.add(hi)
    flood = [(f"f{i:04d}", fp) for i, fp in enumerate(fills)]

    # ---- salted regime: bucket 300 > max_bucket_size 50, under cap
    src = tmp_path / "src1"
    src.mkdir()
    metrics = []
    args = dict(max_bucket_size=50, ledger_bucket_cap=10_000,
                on_metrics=metrics.append)
    spark.createDataFrame(flood, schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    a = (spark, str(src), schema, str(tmp_path / "t1"),
         str(tmp_path / "l1"), str(tmp_path / "c1"), "image_id", "phash")
    wait(stream_fuzzy_dedup(*a, **args))
    assert spark.read.parquet(str(tmp_path / "t1")).count() == 300

    # batch 2: exact dup of one flood row -> must still be dropped
    # (salted join is exact), and metrics must show the hot bucket
    spark.createDataFrame([("dup1", flood[7][1])], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    wait(stream_fuzzy_dedup(*a, **args))
    assert spark.read.parquet(str(tmp_path / "t1")).count() == 300
    assert metrics[-1]["ledger_salted_buckets"] >= 1
    assert metrics[-1]["ledger_dropped_buckets"] == 0

    # ---- capped regime: same flood, cap 100 < bucket size 300
    src2 = tmp_path / "src2"
    src2.mkdir()
    metrics2 = []
    args2 = dict(max_bucket_size=50, ledger_bucket_cap=100,
                 on_metrics=metrics2.append)
    spark.createDataFrame(flood, schema).coalesce(1) \
        .write.mode("append").parquet(str(src2))
    a2 = (spark, str(src2), schema, str(tmp_path / "t2"),
          str(tmp_path / "l2"), str(tmp_path / "c2"), "image_id", "phash")
    wait(stream_fuzzy_dedup(*a2, **args2))

    # probe at Hamming 3 from flood[0] with all differing bits in bands
    # 1..3 -> ONLY shared band is the capped band-0 bucket -> admitted
    near = _i64(flood[0][1] ^ (1 << 16) ^ (1 << 32) ^ (1 << 48))
    # and an exact dup of flood[1]: shares band-1..3 buckets (cold ones,
    # each holding just its base row) -> still dropped despite the cap
    spark.createDataFrame([("edge1", near), ("dup2", flood[1][1])],
                          schema).coalesce(1) \
        .write.mode("append").parquet(str(src2))
    wait(stream_fuzzy_dedup(*a2, **args2))
    ids = {r["image_id"]
           for r in spark.read.parquet(str(tmp_path / "t2")).collect()}
    assert "edge1" in ids            # metered recall trade at the cap
    assert "dup2" not in ids         # cold-band membership still exact
    assert metrics2[-1]["ledger_dropped_buckets"] >= 1
    assert metrics2[-1]["ledger_dropped_rows"] >= 300


def test_jvm_image_source_pixel_parity_and_isolation(spark, tmp_path):
    """The JVM decode seam is executed, not just documented: Spark's
    built-in `image` source (javax.imageio) decodes engine-encoded
    PNGs — including a Paeth-filtered one — to EXACTLY the same pixels
    as the engine's own RFC 2083 decoder (modulo the source's BGR
    layout), and undecodable files drop at the source (the seam's
    analogue of decode_ok=false)."""
    from deduper_spark.functions.png import encode_png
    from deduper_spark.sources.readers import read_image_source

    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (32, 24, 3)).astype(np.uint8)
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "plain.png").write_bytes(encode_png(px))
    (d / "paeth.png").write_bytes(encode_png(px, filter_type=4))
    (d / "poison.png").write_bytes(b"\x89PNG\r\n\x1a\nGARBAGE")

    rows = read_image_source(spark, str(d)).collect()
    assert len(rows) == 2                      # poison dropped at seam
    for r in rows:
        assert (r["h"], r["w"], r["nchannels"]) == (32, 24, 3)
        arr = np.frombuffer(bytes(r["data"]), np.uint8).reshape(32, 24, 3)
        assert np.array_equal(arr[..., ::-1], px), r["origin"]  # BGR


def test_compact_streaming_output_converges_to_batch(spark, tmp_path):
    """After the periodic batch compaction pass, the streaming target
    equals the one-shot batch result on the same corpus — the chained
    A~B~C divergence (previous test) is merged back."""
    import time

    from deduper_spark.streaming.fuzzy import (
        compact_streaming_output,
        stream_fuzzy_dedup,
    )

    A = 0x0F0F0F0F0F0F0F0F
    B = A ^ 0b111
    C = B ^ (0b111 << 20)
    schema = "image_id string, phash long"
    src = tmp_path / "src"
    src.mkdir()

    def wait(q):
        q.awaitTermination(120)
        for _ in range(100):
            if not q.isActive:
                return
            time.sleep(0.2)

    args = (spark, str(src), schema, str(tmp_path / "tgt"),
            str(tmp_path / "ledger"), str(tmp_path / "ckpt"),
            "image_id", "phash")
    dropped_dir = str(tmp_path / "dropped")
    for rid, fp in (("A", A), ("B", B), ("C", C)):
        spark.createDataFrame([(rid, fp)], schema).coalesce(1) \
            .write.mode("append").parquet(str(src))
        wait(stream_fuzzy_dedup(*args, dropped_dir=dropped_dir))
    online = {r["image_id"] for r in
              spark.read.parquet(str(tmp_path / "tgt")).collect()}
    assert online == {"A", "C"}                # divergence, as pinned

    # the bridge evidence holds exactly the dropped row B (id + fp)
    dropped = spark.read.parquet(dropped_dir).collect()
    assert {(r["image_id"], r["phash"]) for r in dropped} == {("B", B)}

    # with the bridge, compaction reassembles {A,B,C} and keeps A only
    compacted = compact_streaming_output(
        spark, str(tmp_path / "tgt"), "image_id", "phash",
        dropped_dir=dropped_dir)
    assert {r["image_id"] for r in compacted.collect()} == {"A"}
    assert set(compacted.columns) == {"image_id", "phash", "batch_id"}

    # without the bridge the retained rows are not within t of each
    # other -> retained-only compaction keeps both (documented limit)
    partial = compact_streaming_output(
        spark, str(tmp_path / "tgt"), "image_id", "phash")
    assert {r["image_id"] for r in partial.collect()} == {"A", "C"}


def test_compact_streaming_output_absent_target(spark, tmp_path):
    """A stream whose every batch was empty writes no target at all
    (the empty-batch short-circuit); a scheduled nightly compaction on
    that state is a no-op empty result, not an AnalysisException —
    mirrors the dropped_dir guard. Corrupt state must still raise."""
    from deduper_spark.streaming.fuzzy import compact_streaming_output

    out = compact_streaming_output(
        spark, str(tmp_path / "never_written"), "image_id", "phash",
        dropped_dir=str(tmp_path / "also_never"))
    assert out.count() == 0
    assert set(out.columns) == {"image_id", "phash", "batch_id"}

    # an empty directory (crashed/zero-row first write) is the same
    (tmp_path / "empty_dir").mkdir()
    out2 = compact_streaming_output(
        spark, str(tmp_path / "empty_dir"), "image_id", "phash")
    assert out2.count() == 0

    # a non-parquet file in the target is NOT "absent" -> raises
    bad = tmp_path / "corrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not parquet at all")
    with pytest.raises(Exception):
        compact_streaming_output(
            spark, str(bad), "image_id", "phash").count()


# ------------------------------------------------------------------
# Fuzz the round-4 fast decoders: truncation / corruption must remain
# ValueError (the mapInPandas isolation contract), never IndexError
# from the new LUT/peek paths.
# ------------------------------------------------------------------

def _sample_jpeg() -> bytes:
    from deduper_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (48, 40, 3)).astype(np.uint8)
    return encode_jpeg(img, quality=90)


def test_jpeg_truncated_entropy_raises_valueerror():
    from deduper_spark.functions.jpeg import decode_jpeg

    buf = _sample_jpeg()
    # cut inside the entropy stream at many depths
    for cut in (len(buf) - 3, len(buf) - 50, len(buf) // 2 + 40):
        with pytest.raises(ValueError):
            decode_jpeg(buf[:cut])


def test_jpeg_bitflip_corruption_isolates():
    """Flipping bytes inside the entropy stream must decode (to wrong
    pixels) or raise ValueError — never IndexError/KeyError from the
    LUT fast path."""
    from deduper_spark.functions.jpeg import decode_jpeg

    buf = bytearray(_sample_jpeg())
    sos = bytes(buf).find(b"\xff\xda")
    rng = np.random.default_rng(13)
    for _ in range(40):
        b2 = bytearray(buf)
        for pos in rng.integers(sos + 14, len(buf) - 2, size=3):
            b2[int(pos)] ^= int(rng.integers(1, 255))
        try:
            decode_jpeg(bytes(b2))
        except ValueError:
            pass


def test_png_bitflip_and_truncation_isolate():
    from deduper_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(14)
    px = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    for ft in (0, 4):
        buf = bytearray(encode_png(px, filter_type=ft))
        # isolation contract: truncation either raises ValueError or —
        # when only the IEND tail is cut and the IDAT is complete —
        # still decodes to the exact pixels; never any other exception
        for cut in (len(buf) - 5, len(buf) // 2, 20):
            try:
                out = decode_png(bytes(buf[:cut]))
                assert np.array_equal(out, px)
            except ValueError:
                pass
        for _ in range(20):
            b2 = bytearray(buf)
            for pos in rng.integers(8, len(buf), size=3):
                b2[int(pos)] ^= int(rng.integers(1, 255))
            try:
                decode_png(bytes(b2))
            except ValueError:
                pass


def test_video_shifted_driver_query_matches_planted_truth(spark):
    """The new `video_shifted` driver query recovers EXACTLY the
    planted truth: trimmed q85 copies of every i%5==2 clip align at
    offset -2 with n_frames-2 votes, and the per-block byte-exact
    role-6 dups align at offset 0 with all frames — mirror of the
    DuckDB oracle in __spark_entry__."""
    import __spark_entry__ as entry

    got = {
        (r["id_l"], r["id_r"]): (r["frame_offset"], r["matched_frames"])
        for r in entry.queries()["video_shifted"](spark, None).collect()
    }
    expected = {}
    for i in range(20):
        nf = 6 + 2 * ((i // 10) % 3)
        if i % 5 == 2:
            expected[(f"vid{i:09d}", f"vid9{i:08d}")] = (-2, nf - 2)
        if i % 10 == 6:
            expected[(f"vid{i - 6:09d}", f"vid{i:09d}")] = (0, nf)
    assert got == expected


def test_image_features_from_source_parity_with_column_path(spark, tmp_path):
    """Foreign-format scale path: features computed over JVM-decoded
    pixels (image source -> image_features_from_source, zero Python
    codec work) are IDENTICAL — phash, means, w/h — to the in-column
    path (extract_image_features over the PNG bytes), incl. a
    Paeth-filtered PNG and a JPEG; a length-corrupt buffer isolates
    as decode_ok=false instead of failing the job."""
    import pandas as pd

    from deduper_spark.functions.jpeg import encode_jpeg
    from deduper_spark.functions.png import encode_png
    from deduper_spark.operators.multimodal import (
        extract_image_features,
        image_features_from_source,
    )
    from deduper_spark.sources.readers import read_image_source

    rng = np.random.default_rng(7)
    blobs = {}
    d = tmp_path / "imgs"
    d.mkdir()
    for name, ft in (("plain.png", 0), ("paeth.png", 4)):
        px = rng.integers(0, 256, (40, 32, 3)).astype(np.uint8)
        blobs[name] = encode_png(px, filter_type=ft)
        (d / name).write_bytes(blobs[name])
    px = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    blobs["photo.jpeg"] = encode_jpeg(px, quality=90)
    (d / "photo.jpeg").write_bytes(blobs["photo.jpeg"])

    src = read_image_source(spark, str(d))
    got = image_features_from_source(src).toPandas()
    got["name"] = got["id"].str.rsplit("/", n=1).str[-1]
    got = got.set_index("name").sort_index()

    col_df = spark.createDataFrame(pd.DataFrame(
        {"id": list(blobs), "bytes": [bytearray(v) for v in blobs.values()]}))
    want = (extract_image_features(col_df, "id", "bytes")
            .toPandas().set_index("id").sort_index())

    assert list(got.index) == list(want.index)
    for c in ("decode_ok", "w", "h"):
        assert list(got[c]) == list(want[c]), c
    # lossless PNGs: identical pixels -> bit-identical features
    for name in ("plain.png", "paeth.png"):
        assert got.loc[name, "phash"] == want.loc[name, "phash"], name
        for c in ("mean_r", "mean_g", "mean_b"):
            assert abs(got.loc[name, c] - want.loc[name, c]) < 1e-9, c
    # JPEG: two independent T.81 IDCT implementations round
    # differently by design — near-dup tolerance, not bit equality
    ham = bin((int(got.loc["photo.jpeg", "phash"])
               ^ int(want.loc["photo.jpeg", "phash"]))
              & ((1 << 64) - 1)).count("1")
    assert ham <= 4, f"JPEG phash drift {ham} bits"
    for c in ("mean_r", "mean_g", "mean_b"):
        assert abs(got.loc["photo.jpeg", c]
                   - want.loc["photo.jpeg", c]) < 2.0, c

    # length-corrupt buffer isolates, not kills
    bad = spark.createDataFrame(
        pd.DataFrame({"origin": ["bad"], "h": [40], "w": [32],
                      "nchannels": [3], "mode": [16],
                      "data": [bytearray(b"\x00" * 17)]}))
    out = image_features_from_source(bad).toPandas()
    assert len(out) == 1 and not out.iloc[0]["decode_ok"]


def test_dedup_image_dir_end_to_end(spark, tmp_path):
    """Foreign-corpus composition: a directory of mixed-format images
    (PNG + JPEG of the same picture, a byte-exact PNG copy, a
    singleton, a poison file) clusters end-to-end through the JVM
    seam with zero Python codec work — near-dup pair found across
    FORMATS, exact pair found, singleton kept, poison dropped."""
    from deduper_spark.functions.jpeg import encode_jpeg
    from deduper_spark.functions.png import encode_png
    from deduper_spark.operators.multimodal import dedup_image_dir

    rng = np.random.default_rng(11)
    # low-frequency patterns (kron-upsampled) so phash is stable
    # across the PNG->JPEG re-encode, like synth's corpus
    def pic(k):
        coarse = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
        return np.kron(coarse, np.ones((8, 8, 1), dtype=np.uint8))

    a, c, d = pic(0), pic(1), pic(2)
    dirp = tmp_path / "corpus"
    dirp.mkdir()
    (dirp / "a1.png").write_bytes(encode_png(a))
    (dirp / "a2.jpeg").write_bytes(encode_jpeg(a, quality=90))
    (dirp / "c1.png").write_bytes(encode_png(c))
    (dirp / "c2.png").write_bytes(encode_png(c))          # byte-exact
    (dirp / "d.png").write_bytes(encode_png(d))
    (dirp / "poison.png").write_bytes(b"\x89PNG\r\n\x1a\nJUNK")

    out = dedup_image_dir(spark, str(dirp)).toPandas()
    out["name"] = out["id"].str.rsplit("/", n=1).str[-1]
    out["cname"] = out["cluster_id"].str.rsplit("/", n=1).str[-1]
    by = out.set_index("name")

    assert len(out) == 5                                  # poison gone
    assert by.loc["a1.png", "cname"] == "a1.png" and by.loc["a1.png", "keep"]
    assert by.loc["a2.jpeg", "cname"] == "a1.png"         # cross-format
    assert not by.loc["a2.jpeg", "keep"]
    assert by.loc["c1.png", "cname"] == "c1.png" and by.loc["c1.png", "keep"]
    assert by.loc["c2.png", "cname"] == "c1.png"
    assert not by.loc["c2.png", "keep"]
    assert by.loc["d.png", "cname"] == "d.png" and by.loc["d.png", "keep"]


def _raw_png(arr: np.ndarray, color_type: int) -> bytes:
    """Minimal RFC 2083 PNG (filter 0 rows) for GRAY (0) / RGBA (6)
    fixtures the engine encoder (RGB-only) cannot produce."""
    import struct as _s
    import zlib

    h, w = arr.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (_s.pack(">I", len(payload)) + tag + payload
                + _s.pack(">I", zlib.crc32(tag + payload)))

    ihdr = _s.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def test_image_features_from_source_gray_and_rgba(spark, tmp_path):
    """The JVM source hands back 1-channel (grayscale PNG) and
    4-channel (RGBA PNG, opaque alpha) buffers; the features operator
    must map both onto the engine's RGB feature space: gray replicates
    across channels, RGBA drops alpha — phash equals the reference
    phash of the equivalent RGB image in both cases."""
    from deduper_spark.functions.phash import phash64
    from deduper_spark.operators.multimodal import image_features_from_source
    from deduper_spark.sources.readers import read_image_source

    rng = np.random.default_rng(13)
    gray = np.kron(rng.integers(0, 256, (8, 8)).astype(np.uint8),
                   np.ones((8, 8), dtype=np.uint8))          # (64, 64)
    rgb = np.kron(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8),
                  np.ones((8, 8, 1), dtype=np.uint8))        # (64, 64, 3)
    rgba = np.dstack([rgb, np.full(rgb.shape[:2], 255, np.uint8)])

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "gray.png").write_bytes(_raw_png(gray, color_type=0))
    (d / "rgba.png").write_bytes(_raw_png(rgba, color_type=6))

    src = read_image_source(spark, str(d))
    got = image_features_from_source(src).toPandas()
    got["name"] = got["id"].str.rsplit("/", n=1).str[-1]
    by = got.set_index("name")

    assert set(by.index) == {"gray.png", "rgba.png"}
    assert list(by["decode_ok"]) == [True, True]
    assert (by.loc["gray.png", "w"], by.loc["gray.png", "h"]) == (64, 64)

    g3 = np.repeat(gray[:, :, None], 3, axis=2)
    assert by.loc["gray.png", "phash"] == phash64(g3)
    for c in ("mean_r", "mean_g", "mean_b"):
        assert abs(by.loc["gray.png", c] - gray.mean()) < 1e-6, c

    assert by.loc["rgba.png", "phash"] == phash64(rgb)
    want = rgb.reshape(-1, 3).mean(axis=0)
    for i, c in enumerate(("mean_r", "mean_g", "mean_b")):
        assert abs(by.loc["rgba.png", c] - want[i]) < 1e-6, c


def test_image_features_from_source_degenerate_rows_isolate(spark):
    """dropInvalid=False rows (h=w=-1, empty buffer) and zero-dim
    buffers must isolate as decode_ok=false — never NaN features or a
    reshape error."""
    import pandas as pd

    from deduper_spark.operators.multimodal import image_features_from_source

    rows = pd.DataFrame({
        "origin": ["invalid", "zerodim", "ok"],
        "h": [-1, 0, 2], "w": [-1, 4, 2], "nchannels": [-1, 3, 3],
        "mode": [-1, 16, 16],
        "data": [bytearray(), bytearray(), bytearray(range(12))],
    })
    out = (image_features_from_source(spark.createDataFrame(rows))
           .toPandas().set_index("id"))
    assert not out.loc["invalid", "decode_ok"]
    assert not out.loc["zerodim", "decode_ok"]
    assert out.loc["ok", "decode_ok"]
    assert not out[["mean_r", "mean_g", "mean_b"]].isna().loc["ok"].any()


def test_dedup_image_dir_empty_dir(spark, tmp_path):
    """A directory with no decodable images yields an empty cluster
    table with the full schema — not an exception mid-plan."""
    from deduper_spark.operators.multimodal import dedup_image_dir

    d = tmp_path / "empty"
    d.mkdir()
    (d / "junk.png").write_bytes(b"\x89PNG\r\n\x1a\nNOPE")
    out = dedup_image_dir(spark, str(d))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "cluster_id", "keep"]


def test_image_features_from_source_null_rows_isolate(spark):
    """NULL buffers / NULL dims (None in the driver, NaN once Arrow
    hands them to pandas) must isolate as decode_ok=false — not
    TypeError/ValueError task death."""
    from deduper_spark.operators.multimodal import image_features_from_source

    df = spark.createDataFrame(
        [("nullbuf", 2, 2, 3, 16, None),
         ("nulldims", None, None, None, None, bytearray(b"\x00" * 12)),
         ("ok", 2, 2, 3, 16, bytearray(range(12)))],
        "origin string, h int, w int, nchannels int, mode int, data binary")
    out = (image_features_from_source(df).toPandas()
           .set_index("id")["decode_ok"].to_dict())
    assert out == {"nullbuf": False, "nulldims": False, "ok": True}


def test_image_features_from_source_fuzz_never_throws(spark):
    """200 adversarial (h, w, nchannels, buffer) combinations — random
    dims vs buffer-length mismatches, huge claimed dims, zero sizes —
    must all come back as rows (decode_ok true iff the row is
    consistent), never a task error."""
    import pandas as pd

    from deduper_spark.operators.multimodal import image_features_from_source

    rng = np.random.default_rng(29)
    rows = []
    for i in range(200):
        h = int(rng.integers(-2, 6))
        w = int(rng.integers(-2, 6))
        nch = int(rng.integers(-1, 6))
        blen = int(rng.integers(0, 80))
        rows.append((f"r{i:03d}", h, w, nch, 16,
                     bytearray(rng.integers(0, 256, blen, dtype=np.uint8))))
        if i % 37 == 0:  # huge claimed dims, tiny buffer
            rows.append((f"big{i:03d}", 1 << 20, 1 << 20, 3, 16,
                         bytearray(b"\x00" * 8)))
    pdf = pd.DataFrame(rows, columns=["origin", "h", "w", "nchannels",
                                      "mode", "data"])
    out = (image_features_from_source(spark.createDataFrame(pdf))
           .toPandas().set_index("id"))
    assert len(out) == len(rows)
    for _, (rid, h, w, nch, _m, buf) in pdf.iterrows():
        consistent = (h > 0 and w > 0 and nch in (1, 3, 4)
                      and len(buf) == h * w * nch)
        assert out.loc[rid, "decode_ok"] == consistent, rid


def test_dedup_image_dir_recursive(spark, tmp_path):
    """recursive=True picks up images in nested directories; the
    default (False) sees only the top level."""
    from deduper_spark.functions.png import encode_png
    from deduper_spark.operators.multimodal import dedup_image_dir

    rng = np.random.default_rng(31)

    def pic():
        return np.kron(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8),
                       np.ones((8, 8, 1), dtype=np.uint8))

    d = tmp_path / "corpus"
    (d / "sub").mkdir(parents=True)
    top = pic()
    (d / "top.png").write_bytes(encode_png(top))
    (d / "sub" / "nested.png").write_bytes(encode_png(pic()))
    (d / "sub" / "topcopy.png").write_bytes(encode_png(top))

    assert dedup_image_dir(spark, str(d)).count() == 1
    out = dedup_image_dir(spark, str(d), recursive=True).toPandas()
    assert len(out) == 3
    out["name"] = out["id"].str.rsplit("/", n=1).str[-1]
    by = out.set_index("name")
    # keep-first = min full path: 'corpus/sub/topcopy.png' sorts
    # before 'corpus/top.png', so the NESTED copy is the survivor
    assert by.loc["top.png", "cluster_id"].endswith("topcopy.png")
    assert not by.loc["top.png", "keep"]
    assert by.loc["topcopy.png", "keep"]
    assert by.loc["nested.png", "keep"]
