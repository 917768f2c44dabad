"""Multimodal column operators — image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the codec layer is the
engine's deterministic 'dspk' container (functions/phash.py). Real
PNG/JPEG/audio/video decode requires libraries absent from this
container and is STUBBED: decode_image raises NotImplementedError for
foreign magics, and extract_features tags such rows decode_ok=false
instead of failing the job (poisoned blobs must never kill a 100 TB
pass — same isolation philosophy as the reference's log-only sink
reconciliation, consumers/BaseConsumer.kt:106-117).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "id string, decode_ok boolean, w int, h int, mean_r double, "
    "mean_g double, mean_b double, phash long"
)


def extract_image_features(df: DataFrame, id_col: str, bytes_col: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deduper_spark.functions.phash import decode_image, phash64

        for pdf in batches:
            out = []
            for rid, buf in zip(pdf["id"], pdf["b"]):
                try:
                    px = decode_image(bytes(buf))
                    means = px.reshape(-1, 3).mean(axis=0)
                    out.append((rid, True, px.shape[1], px.shape[0],
                                round(float(means[0]), 6),
                                round(float(means[1]), 6),
                                round(float(means[2]), 6), phash64(px)))
                except (NotImplementedError, ValueError):
                    out.append((rid, False, None, None, None, None, None, None))
            yield pd.DataFrame(out, columns=["id", "decode_ok", "w", "h",
                                             "mean_r", "mean_g", "mean_b",
                                             "phash"])

    sel = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("b"))
    return sel.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def resize_images(df: DataFrame, id_col: str, bytes_col: str,
                  out_w: int, out_h: int) -> DataFrame:
    """Block-mean resize, re-encoded into the dspk container.
    Undecodable rows pass through with resized_ok=false."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deduper_spark.functions.phash import decode_image, encode_image

        for pdf in batches:
            ids, blobs, oks = [], [], []
            for rid, buf in zip(pdf["id"], pdf["b"]):
                try:
                    px = decode_image(bytes(buf))
                    h, w, _ = px.shape
                    yi = (np.arange(out_h) * h // out_h)
                    xi = (np.arange(out_w) * w // out_w)
                    small = px[yi][:, xi]
                    blobs.append(encode_image(small))
                    oks.append(True)
                except (NotImplementedError, ValueError):
                    blobs.append(None)
                    oks.append(False)
                ids.append(rid)
            yield pd.DataFrame({"id": ids, "bytes": blobs, "resized_ok": oks})

    sel = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("b"))
    return sel.mapInPandas(run, schema="id string, bytes binary, resized_ok boolean")


def sample_video_frames(df: DataFrame, id_col: str, bytes_col: str,
                        every_n: int = 10) -> DataFrame:
    """Frame sampling for video blobs.

    STUB: no video codec exists in this container. The operator's
    Spark contract (explode one blob row into frame rows with
    frame_idx, preserving partitioning) is exercised by treating the
    dspk container as a 1-frame video; real containers raise in the
    codec layer and surface as decode_ok=false rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deduper_spark.functions.phash import decode_image, encode_image

        for pdf in batches:
            rows = []
            for rid, buf in zip(pdf["id"], pdf["b"]):
                try:
                    px = decode_image(bytes(buf))   # 1-frame 'video'
                    rows.append((rid, 0, encode_image(px), True))
                except (NotImplementedError, ValueError):
                    rows.append((rid, None, None, False))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_bytes",
                                              "decode_ok"])

    sel = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("b"))
    return sel.mapInPandas(
        run, schema="id string, frame_idx int, frame_bytes binary, decode_ok boolean"
    )
