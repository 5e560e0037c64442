"""Deterministic synthetic transcript table (FIXTURES.md §F1).

Schema (authoritative, BASELINE.json input_hint): conv_id:string,
turn_idx:int32, role:string, text:string, tool:string, ts:timestamp.

Generation is *distributed and per-conversation seeded*: each
conversation's rows derive from ``SeedSequence([seed, conv_index])``, so
any subset of conversations can be generated on any executor in any
order and the table is bit-identical regardless of parallelism — the
property that lets the same generator drive tests (tiny), benches
(small) and a would-be 10^12-turn run without a driver-side bottleneck.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, types as T

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), False),
])

ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
ROLE_P = np.array([0.42, 0.42, 0.04, 0.12])
TOOLS = np.array([f"tool_{name}" for name in
                  ["search", "calc", "code", "sql", "web", "files",
                   "mail", "cal", "img", "map", "api", "shell"]],
                 dtype=object)
EPOCH_BASE_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in micros


def _vocab(seed: int = 42, size: int = 512) -> np.ndarray:
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for i in range(size):
        L = int(rng.integers(3, 10))
        words.append("".join(letters[rng.integers(0, 26, L)]) + str(i % 10))
    return np.array(words, dtype=object)


_VOCAB = _vocab()


def _conv_frame(seed: int, conv_index: int) -> pd.DataFrame:
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_index]))
    # Zipf-skewed conversation length (s=1.2 clamped 1..2000)
    length = int(min(2000, rng.zipf(1.2)))
    conv_id = f"conv-{conv_index:08d}"

    roles = ROLES[rng.choice(4, size=length, p=ROLE_P)]
    tool = np.where(roles == "tool",
                    TOOLS[rng.integers(0, len(TOOLS), length)], "")

    # text: token soup, lognormal length in chars, ~2% empty
    nchars = np.clip(rng.lognormal(4.0, 1.0, length), 0, 8000).astype(int)
    nchars[rng.random(length) < 0.02] = 0
    texts = []
    for nc in nchars:
        if nc == 0:
            texts.append("")
            continue
        nwords = max(1, nc // 8)
        texts.append(" ".join(_VOCAB[rng.integers(0, len(_VOCAB), nwords)]))

    gaps_us = (rng.exponential(60.0, length) + 1.0).clip(1, 300) * 1_000_000
    base = EPOCH_BASE_US + conv_index * 3_600_000_000
    ts = (base + np.cumsum(gaps_us)).astype("int64").view("datetime64[us]")

    return pd.DataFrame({
        "conv_id": conv_id,
        "turn_idx": np.arange(length, dtype=np.int32),
        "role": roles,
        "text": np.array(texts, dtype=object),
        "tool": tool,
        "ts": ts,
    })


def generate_pandas(n_conv: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation for unit tests (tiny scales only)."""
    return pd.concat([_conv_frame(seed, i) for i in range(n_conv)],
                     ignore_index=True)


def generate(spark: SparkSession, n_conv: int, seed: int = 42,
             partitions: int = 0) -> DataFrame:
    """Distributed generation: spark.range over conversation ids +
    mapInPandas — each task generates only its conversations."""
    import pyspark.sql.functions as F

    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            for idx in pdf["id"].tolist():
                yield _conv_frame(seed, int(idx))

    # In-partition sort makes each output partition's row order (and so
    # any downstream parquet file) deterministic across parallelism
    # levels — shuffle arrival order is not.
    ids = (spark.range(n_conv).repartition(partitions, F.col("id"))
                .sortWithinPartitions("id"))
    return ids.mapInPandas(gen, schema=SCHEMA)
