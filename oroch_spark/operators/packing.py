"""Sequence packing: assemble tokenized documents into fixed-token-budget
training sequences — the step between a cleaned corpus and a trainer's
(batch, seq_len) tensors. Two industry-standard shapes:

* :func:`pack_concat` — concat-and-chunk (GPT-2/T5 pretraining style):
  documents are laid end-to-end in a stable order and cut every
  ``budget`` tokens; a document may straddle pack boundaries. Pure JVM
  (window cumsum + sequence/explode, whole-stage codegen). Scale shape:
  the stream is split into hash buckets and each bucket is packed
  independently — the window never sees more than one bucket, so there
  is no global-sort bottleneck; one shuffle total.

* :func:`pack_bfd` — no-split packing: each document lands whole in
  exactly one pack (instruction-tuning / contrastive batches, where
  truncating a document corrupts the example). Best-fit-decreasing
  computed over the LENGTH HISTOGRAM (the public SPFHP idea — Krell et
  al. 2021, arXiv:2107.02027 — packing state indexed by remaining
  capacity): the executor-side Python loop is bounded by
  O(budget * log budget) iterations per bucket REGARDLESS of document
  count; doc-to-pack assignment stays fully vectorized numpy.
  Documents longer than the budget get isolated singleton packs
  (truncation is the caller's policy decision).

Both emit deterministic assignments: re-running on any partitioning or
cluster size reproduces identical pack ids and offsets (hash buckets +
stable in-bucket order; no RNG, no task-order dependence).
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _with_bucket(df: DataFrame, key_cols: Sequence[str], n_buckets: int,
                 seed: int) -> DataFrame:
    b = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols],
                          F.lit(int(seed))),
               F.lit(int(n_buckets))).cast("int")
    return df.withColumn("bucket", b)


def pack_concat(df: DataFrame, key_cols: Sequence[str],
                tokens_col: str, budget: int,
                n_buckets: int = 64, seed: int = 0) -> DataFrame:
    """Concat-and-chunk packing plan.

    Returns one row per (document, pack) slice:
    ``key_cols..., bucket, pack_id, doc_from, doc_to, pack_offset`` —
    document tokens ``[doc_from, doc_to)`` land in pack ``(bucket,
    pack_id)`` starting at ``pack_offset``. A document that fits the
    remainder of its pack yields one slice; straddlers yield one slice
    per spanned pack. Every pack except each bucket's last is exactly
    ``budget`` tokens — the gather plan a training-shard writer
    executes.

    Zero-token documents yield one empty slice at the current cursor
    (they keep their lineage row; writers skip ``doc_from == doc_to``).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    d = _with_bucket(df, key_cols, n_buckets, seed)
    w = (Window.partitionBy("bucket")
         .orderBy(*[F.col(c) for c in key_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = F.col(tokens_col).cast("long")
    d = d.select(*key_cols, "bucket", n.alias("_n"),
                 (F.sum(n).over(w) - n).alias("_start"))
    start, nn = F.col("_start"), F.col("_n")
    end_pack = F.when(nn > 0, F.floor((start + nn - 1) / budget)) \
        .otherwise(F.floor(start / budget))
    d = d.withColumn("_p0", F.floor(start / budget).cast("long")) \
         .withColumn("_p1", end_pack.cast("long"))
    d = d.withColumn("pack_id", F.explode(F.sequence("_p0", "_p1")))
    p = F.col("pack_id")
    doc_from = F.greatest(p * budget - start, F.lit(0))
    doc_to = F.least(nn, (p + 1) * budget - start)
    pack_off = F.greatest(start - p * budget, F.lit(0))
    return d.select(
        *key_cols, "bucket", p.alias("pack_id"),
        doc_from.cast("long").alias("doc_from"),
        doc_to.cast("long").alias("doc_to"),
        pack_off.cast("long").alias("pack_offset"))


def _bfd_histogram(lengths: np.ndarray, budget: int) -> np.ndarray:
    """Best-fit-decreasing over the length histogram (batched).

    Returns pack ids (0..npacks-1, dense, deterministic) for each
    input; ``lengths`` must be sorted DESCENDING by the caller.
    State: for each remaining capacity r in [0, budget], the ids of
    open packs holding exactly r — capacity-indexed like SPFHP, so the
    loop below runs per (distinct length, refill round), never per
    document. Batching nuance: all open packs at the best-fitting
    capacity level absorb one doc each before any is refilled, whereas
    per-document BFD would refill the first pack immediately — the
    fill totals can differ by a few tokens; the invariants (every doc
    placed once, no pack over budget) and the loop bound are what this
    function guarantees. Docs with length > budget must be excluded
    upstream.
    """
    assign = np.empty(len(lengths), dtype=np.int64)
    open_by_rem: list[list[np.ndarray]] = [[] for _ in range(budget + 1)]
    navail = np.zeros(budget + 1, dtype=np.int64)
    next_pack = 0
    pos = 0
    ulens, starts = np.unique(-lengths, return_index=True)
    ulens = -ulens  # descending distinct lengths
    starts = np.append(starts, len(lengths))
    for li in range(len(ulens)):
        L = int(ulens[li])
        c = int(starts[li + 1] - starts[li])
        if L == 0:
            # zero-token docs carry no payload; park them in pack 0
            if next_pack == 0:
                next_pack = 1
                open_by_rem[budget].append(
                    np.zeros(1, dtype=np.int64))
                navail[budget] += 1
            assign[pos:pos + c] = 0
            pos += c
            continue
        while c > 0:
            nz = np.flatnonzero(navail[L:])
            if len(nz):
                # best fit: smallest remaining capacity >= L first;
                # packs refilled at r-L re-enter the scan, so equal
                # lengths co-habit up to budget // L per pack
                r = int(L + nz[0])
                k = min(int(navail[r]), c)
                ids = _pop(open_by_rem[r], navail, r, k)
                assign[pos:pos + k] = ids
                open_by_rem[r - L].append(ids)
                navail[r - L] += k
                pos += k
                c -= k
            else:
                # no open pack fits: open new packs pre-filled with
                # budget // L docs each (what repeated best fit would
                # reach), so same-length docs never strand singly
                m = budget // L
                npk = (c + m - 1) // m
                ids = np.arange(next_pack, next_pack + npk,
                                dtype=np.int64)
                next_pack += npk
                assign[pos:pos + c] = np.repeat(ids, m)[:c]
                last_fill = c - m * (npk - 1)
                if npk > 1:
                    open_by_rem[budget - m * L].append(ids[:-1])
                    navail[budget - m * L] += npk - 1
                open_by_rem[budget - last_fill * L].append(ids[-1:])
                navail[budget - last_fill * L] += 1
                pos += c
                c = 0
    return assign


def _pop(bucket_lists: list[np.ndarray], navail: np.ndarray, r: int,
         k: int) -> np.ndarray:
    """Pop k pack ids from the capacity-r free list (array-chunked)."""
    out = []
    need = k
    while need > 0:
        chunk = bucket_lists[-1]
        if len(chunk) <= need:
            out.append(bucket_lists.pop())
            need -= len(chunk)
        else:
            out.append(chunk[:need])
            bucket_lists[-1] = chunk[need:]
            need = 0
    navail[r] -= k
    return np.concatenate(out) if len(out) > 1 else out[0]


def pack_bfd(df: DataFrame, key_cols: Sequence[str], tokens_col: str,
             budget: int, n_buckets: int = 64, seed: int = 0
             ) -> DataFrame:
    """No-split packing: each document assigned whole to one pack.

    Output: ``key_cols..., n_tokens, bucket, pack_id, pack_offset,
    oversize`` — ``(bucket, pack_id)`` identifies the pack;
    ``pack_offset`` is the doc's token offset inside it (docs laid out
    in assignment order: length-descending, key-ascending tiebreak).
    Docs with ``n_tokens > budget`` get singleton packs flagged
    ``oversize`` (caller truncates or drops). Pack token totals never
    exceed ``budget`` except those singletons.

    Per-bucket work: one numpy sort + the histogram-indexed BFD loop
    (O(budget log budget) iterations however many documents the bucket
    holds); buckets pack in parallel via applyInPandas — one shuffle.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    d = _with_bucket(df, key_cols, n_buckets, seed) \
        .select(*key_cols, "bucket",
                F.col(tokens_col).cast("long").alias("n_tokens"))
    schema = T.StructType(
        [d.schema[c] for c in (*key_cols, "bucket", "n_tokens")]
        + [T.StructField("pack_id", T.LongType()),
           T.StructField("pack_offset", T.LongType()),
           T.StructField("oversize", T.BooleanType())])
    keys = list(key_cols)
    B = int(budget)

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic order: length desc, then keys asc
        pdf = pdf.sort_values(["n_tokens", *keys],
                              ascending=[False] + [True] * len(keys),
                              kind="mergesort").reset_index(drop=True)
        lens = pdf["n_tokens"].to_numpy(np.int64)
        over = lens > B
        fit = np.flatnonzero(~over)
        assign = np.full(len(pdf), -1, dtype=np.int64)
        if len(fit):
            assign[fit] = _bfd_histogram(lens[fit], B)
        npacks = int(assign.max() + 1) if len(fit) else 0
        oidx = np.flatnonzero(over)
        assign[oidx] = npacks + np.arange(len(oidx))
        # offsets: cumsum of lengths within each pack in assignment order
        order = np.argsort(assign, kind="stable")
        alens = lens[order]
        csum = np.cumsum(alens) - alens
        packs = assign[order]
        first = np.zeros(len(order), dtype=bool)
        first[0:1] = True
        first[1:] = packs[1:] != packs[:-1]
        base = np.maximum.accumulate(np.where(first, csum, 0))
        offs = np.empty(len(order), dtype=np.int64)
        offs[order] = csum - base
        pdf["pack_id"] = assign
        pdf["pack_offset"] = offs
        pdf["oversize"] = over
        return pdf

    return d.groupBy("bucket").applyInPandas(pack_one, schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Utilization rollup of a :func:`pack_bfd` result: one row per
    bucket with pack count, token totals, and fill ratio (excluding
    oversize singletons, which are full by definition of the policy)."""
    per_pack = (packed.filter(~F.col("oversize"))
                .groupBy("bucket", "pack_id")
                .agg(F.sum("n_tokens").alias("tok")))
    return (per_pack.groupBy("bucket")
            .agg(F.count("*").alias("n_packs"),
                 F.sum("tok").alias("n_tokens"),
                 (F.sum("tok") / (F.count("*") * F.lit(budget)))
                 .alias("fill_ratio")))
