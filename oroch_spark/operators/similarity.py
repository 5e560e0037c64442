"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (built-in higher-order
functions — zip_with/aggregate — JVM-side), and an LSH-bucketed variant
as the scale path: random-hyperplane signatures bucket vectors so the
pairwise work at 100 TB happens within buckets instead of n^2.
"""
from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x)


def _norm(a):
    # square in double (float32 squares would lose the precision the
    # cross-engine oracle compare needs)
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int | None = None) -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector.
    One scan, no shuffle until the final top-k (orderBy+limit is a
    TakeOrdered — partial top-k per partition, k rows to the driver).
    ``round_to`` rounds the score before ranking (cross-engine-stable
    comparisons)."""
    q = F.array(*[F.lit(float(x)).cast("float") for x in query_vec])
    qn = float(np.sqrt(np.sum(np.square(np.asarray(query_vec, np.float64)))))
    cos = (_dot(F.col(vec_col), q)
           / (F.greatest(_norm(F.col(vec_col)), F.lit(1e-30)) * F.lit(qn)))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (df.select(id_col, cos.alias("cosine"))
              .orderBy(F.col("cosine").desc(), F.col(id_col))
              .limit(k))


def rp_lsh_buckets(df: DataFrame, dim: int, n_planes: int = 16,
                   seed: int = 42, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: sign pattern of
    ``n_planes`` fixed projections, packed into a long. Vectors in the
    same bucket are ANN candidates; at scale, join/group within
    buckets replaces the quadratic scan."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = None
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)).cast("float") for x in planes[i]])
        bit = F.when(_dot(F.col(vec_col), p) > 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                         F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket.bitwiseOR(bit)
    return df.select(id_col, vec_col, bucket.alias("bucket"))


def _kmeans_fit(x: "np.ndarray", k: int, iters: int, seed: int) -> "np.ndarray":
    """Tiny deterministic k-means (numpy, driver-side — centroid table
    is small by construction; the data never leaves the executors)."""
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for j in range(len(cent)):
            m = lab == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    return cent


def ivf_assign(df: DataFrame, centroids: "np.ndarray",
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """IVF coarse quantizer: nearest-centroid list id per vector,
    computed JVM-side (argmin over per-centroid squared distances built
    as array expressions — no UDF, no shuffle)."""
    dists = F.array(*[
        F.aggregate(
            F.zip_with(F.col(vec_col),
                       F.array(*[F.lit(float(v)).cast("float")
                                 for v in c]),
                       lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0).cast("double"), lambda acc, x: acc + x)
        for c in centroids
    ])
    lst = (F.array_position(dists, F.array_min(dists)) - 1) \
        .cast("int").alias("ivf_list")
    return df.select(id_col, vec_col, lst)


def ann_topk_ivf(df: DataFrame, query_vec: list[float], k: int = 10,
                 n_centroids: int = 16, n_probe: int = 6,
                 train_sample: int = 512, iters: int = 5, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding"
                 ) -> DataFrame:
    """IVF approximate top-k: k-means centroids from a deterministic
    sample, vectors bucketed by nearest centroid, search only the
    ``n_probe`` lists nearest the query. At scale the assignment is a
    one-pass narrow map and the search touches n_probe/n_centroids of
    the data; the centroid table broadcast is O(k*dim)."""
    sample = np.array(
        [r[0] for r in df.select(vec_col).orderBy(id_col)
         .limit(train_sample).collect()], dtype=np.float64)
    cent = _kmeans_fit(sample, n_centroids, iters, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    probes = np.argsort(((cent - q) ** 2).sum(axis=1))[:n_probe]
    assigned = ivf_assign(df, cent, id_col, vec_col)
    cand = assigned.filter(F.col("ivf_list")
                           .isin([int(p) for p in probes]))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.9,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          n_planes: int = 0, seed: int = 42,
                          dim: int | None = None,
                          round_to: int | None = 6) -> DataFrame:
    """Embedding near-duplicate pairs: (id_a < id_b) with cosine >=
    threshold.

    ``n_planes=0``: exact all-pairs join (oracle-checkable; quadratic —
    small inputs / verification only). ``n_planes>0``: the scale path —
    random-hyperplane LSH buckets first, the pair join runs only inside
    buckets, so work is sum of bucket sizes squared, not n^2; near-dups
    (cosine ~ 1) land in the same bucket with high probability."""
    norm = F.greatest(_norm(F.col(vec_col)), F.lit(1e-30))
    base = df.select(id_col, vec_col, norm.alias("_n"))
    if n_planes > 0:
        if dim is None:
            raise ValueError("dim is required for the LSH path")
        b = rp_lsh_buckets(df, dim, n_planes, seed, id_col, vec_col)
        base = base.join(b.select(id_col, "bucket"), id_col)
        join_cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) \
            & (F.col("a.bucket") == F.col("b.bucket"))
    else:
        join_cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    a, b = base.alias("a"), base.alias("b")
    cos = (_dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
           / (F.col("a._n") * F.col("b._n")))
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (a.join(b, join_cond)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"),
                     cos.alias("cosine"))
             .filter(F.col("cosine") >= threshold))


def ann_topk_lsh(df: DataFrame, query_vec: list[float], k: int = 10,
                 n_planes: int = 8, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (multi-probe)."""
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qbits = 0
    for i in range(n_planes):
        if float(np.dot(planes[i], query_vec)) > 0:
            qbits |= 1 << i
    probes = {qbits}
    if probe_hamming >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    buckets = rp_lsh_buckets(df, dim, n_planes, seed, id_col, vec_col)
    cand = buckets.filter(F.col("bucket").isin(list(probes)))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
