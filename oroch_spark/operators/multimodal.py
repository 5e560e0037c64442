"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media decode libraries (PIL/ffmpeg/etc.) are not in this container, so
the *decode* step is stubbed (deterministic fake behind a flag /
NotImplementedError), while the Spark-side plumbing — schema, Arrow
batch shapes, mapInPandas signatures, partition sizing — is real and
tested. Swap ``_decode_image_stub`` for a real decoder on a cluster
with the libs installed.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),      # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),   # opaque encoded bytes
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feat", T.ArrayType(T.FloatType())),
    T.StructField("n_bytes", T.IntegerType()),
])


def _decode_image_stub(payload: bytes, deterministic_fake: bool = True
                       ) -> np.ndarray:
    """STUB: real impl would be PIL.Image.open(BytesIO(payload)).
    The deterministic fake derives a tiny pseudo-pixel array from the
    payload bytes so the downstream plumbing is testable."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg, not present in this "
            "container; run with deterministic_fake=True for plumbing "
            "tests")
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32)


def extract_features(df: DataFrame, batch_rows: int = 256,
                     deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.
    Arrow moves the binary column in zero-copy batches; each batch is
    processed vectorized. Partition sizing note: media rows are large,
    so callers should repartition to keep (rows x avg payload) within
    executor memory — the 100 TB knob is partition count, not code."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p, deterministic_fake).mean(axis=0)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feat": [f.tolist() for f in feats],
                "n_bytes": pdf["payload"].str.len().astype("int32"),
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        size = int(rng.integers(100, 4000))
        rows.append((i, "image", "image/fake",
                     bytes(rng.integers(0, 256, size, dtype=np.uint8)),
                     64, 64, 0))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
