"""Deterministic sampling, leakage-safe splitting, and dataset mixing.

The training-data-pipeline operators Spark's own ``df.sample`` cannot
provide at 100 TB: ``sample()`` draws per-partition from a seeded RNG,
so the kept set CHANGES whenever partitioning, cluster size, or task
scheduling changes — a resumed or re-run pipeline sees a different
sample. Every operator here instead hashes STABLE ROW KEYS: membership
is a pure function of (key, seed), invariant to partitioning and
execution order, reproducible bit-for-bit across runs and cluster
sizes. All pure JVM expressions (xxhash64 inside whole-stage codegen)
— no UDFs, no shuffle, no driver state.

The reference library has no sampling surface (it is a codec library,
SURVEY.md §0); these are the §2.6-style "beyond the reference"
pipeline operators, same category as `operators/dedup.py`.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

_TWO64 = float(1 << 64)


def _unit_hash(key_cols: Sequence[str], seed: int) -> Column:
    """Deterministic uniform-ish draw in [0, 1) per key.

    xxhash64 of (keys..., seed) is a signed 64-bit value; affinely
    mapped to [0, 1). Collision-free in the float mantissa down to
    2^-53 — fraction thresholds far below that are meaningless anyway.
    """
    h = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(int(seed)))
    return h / F.lit(_TWO64) + F.lit(0.5)


def hash_sample(df: DataFrame, key_cols: Sequence[str], fraction: float,
                seed: int = 0) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by key hash.

    Unlike ``df.sample`` the decision rides with the KEY: re-running on
    a different cluster size / partitioning / file split keeps exactly
    the same rows, and two tables sampled with the same keys + seed
    keep ALIGNED subsets (e.g. documents and their embeddings).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(_unit_hash(key_cols, seed) < F.lit(float(fraction)))


def split_by_key(df: DataFrame, key_cols: Sequence[str],
                 fractions: dict[str, float], seed: int = 0
                 ) -> dict[str, DataFrame]:
    """Leakage-safe train/eval/test split: every row of a key lands in
    exactly one side (hash the GROUPING key — e.g. conv_id, not
    turn_idx — so a conversation never straddles train and eval).

    ``fractions`` maps split name -> fraction; must sum to 1 (within
    1e-9). Splits are disjoint and exhaustive by construction: the unit
    interval is cut at cumulative fraction boundaries and each key's
    hash picks its interval.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = _unit_hash(key_cols, seed)
    out: dict[str, DataFrame] = {}
    lo = 0.0
    names = list(fractions)
    for i, name in enumerate(names):
        hi = 1.0 if i == len(names) - 1 else lo + fractions[name]
        out[name] = df.filter((u >= F.lit(lo)) & (u < F.lit(hi)))
        lo = hi
    return out


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      seed: int = 0,
                      key_cols: Optional[Sequence[str]] = None
                      ) -> DataFrame:
    """Per-stratum deterministic sampling — the quality-tier /
    language-rebalance primitive ("keep 100% of high-quality docs, 10%
    of low"): each row's keep-threshold is looked up from its stratum
    value, membership still decided by key hash (reproducible,
    partitioning-invariant). Strata missing from ``fractions`` keep
    ``default_fraction``.
    """
    key_cols = list(key_cols) if key_cols else [strata_col]
    thresh: Column = F.lit(float(default_fraction))
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} not in [0,1]")
        thresh = F.when(F.col(strata_col) == F.lit(value),
                        F.lit(float(frac))).otherwise(thresh)
    return df.filter(_unit_hash(key_cols, seed) < thresh)


def epoch_order(df: DataFrame, key_cols: Sequence[str], seed: int = 0,
                epoch: int = 0, order_col: str = "epoch_order"
                ) -> DataFrame:
    """Attach a deterministic global shuffle key for one training epoch.

    ``xxhash64(keys..., seed, epoch)`` gives every row a pseudo-random
    rank that is a pure function of content — the epoch permutation is
    identical on any cluster size, and each epoch is an independent
    permutation. Writers materialize the order with
    ``repartitionByRange(order_col).sortWithinPartitions(order_col)``
    (one range shuffle; sampled boundaries keep partitions balanced) —
    the scalable replacement for a global ORDER BY rand().
    """
    rank = F.xxhash64(*[F.col(c) for c in key_cols],
                      F.lit(int(seed)), F.lit(int(epoch)))
    return df.withColumn(order_col, rank)


def mix_datasets(sources: dict[str, tuple[DataFrame, float]],
                 key_cols: Sequence[str], seed: int = 0,
                 epoch: int = 0,
                 source_col: str = "source",
                 order_col: str = "epoch_order") -> DataFrame:
    """Weighted dataset mixture with a deterministic interleave.

    ``sources`` maps source name -> (df, sampling_fraction): each
    source is hash-sampled at its fraction (the caller derives
    fractions from token budgets — e.g. 2 epochs of wiki, 0.3 of web),
    tagged with its name, unioned by COLUMN NAME, and given the
    :func:`epoch_order` rank so downstream writes produce one
    deterministic interleaved stream. Re-running, resuming, or scaling
    the cluster reproduces the same mixture in the same order.

    All inputs must share the projected schema (union is by name).
    """
    parts = []
    for name, (src, frac) in sources.items():
        s = hash_sample(src, key_cols, frac, seed=seed)
        parts.append(s.withColumn(source_col, F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # salt the rank with the source name so two sources sharing a key
    # value don't collide onto identical ranks
    rank = F.xxhash64(*[F.col(c) for c in key_cols], F.col(source_col),
                      F.lit(int(seed)), F.lit(int(epoch)))
    return out.withColumn(order_col, rank)
