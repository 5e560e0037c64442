"""Similarity-operator scale/recall tests: multi-table LSH must recover
a planted high-cosine near-dup, and IVF assignment must not inline
centroid literals into the plan."""
import numpy as np
import pytest

from pyspark.sql import functions as F

from oroch_spark.operators import similarity

DIM = 32


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, DIM)).astype(np.float32)
    # planted near-dup: cosine(100, 101) >= 0.99
    vecs[101] = vecs[100] + 0.05 * rng.standard_normal(DIM).astype(
        np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_lsh_recovers_planted_high_cosine_pair(emb):
    # the high-threshold regime: more planes, few tables
    out = similarity.cosine_near_dup_pairs(
        emb, threshold=0.95, n_planes=8, n_tables=8, dim=DIM).collect()
    assert any((r.id_a, r.id_b) == (100, 101) for r in out), out
    # and it agrees with the exact path at this threshold
    exact = similarity.cosine_near_dup_pairs(emb, threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in out} == \
        {(r.id_a, r.id_b) for r in exact}


def test_lsh_multi_topk_matches_exact_on_small(emb):
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 100).collect()[0].embedding]
    exact = {r.vec_id for r in
             similarity.cosine_topk(emb, q, k=5, round_to=6).collect()}
    approx = {r.vec_id for r in similarity.ann_topk_lsh_multi(
        emb, q, k=5, n_planes=3, n_tables=10).collect()}
    assert len(exact & approx) >= 4


def test_ivf_plan_has_no_centroid_literals(emb):
    # 64 centroids x 32 dims: the old expression-tree formulation would
    # put 2048 float literals in the plan; the pandas-UDF path keeps the
    # plan O(1) in centroid count
    cent = np.arange(64 * DIM, dtype=np.float64).reshape(64, DIM)
    assigned = similarity.ivf_assign(emb, cent)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "EvalPython" in plan
    assert len(plan) < 20000, len(plan)
    assert plan.count("2016.0") == 0  # no centroid values inlined


def test_ivf_runs_at_real_sizes(spark):
    # VERDICT acceptance: 256 centroids x 1024 dims with a plan free of
    # thousand-literal arrays (old formulation: 262k literals; dead)
    rng = np.random.default_rng(21)
    dim, n_cent = 1024, 256
    vecs = rng.standard_normal((400, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    out = similarity.ann_topk_ivf(df, q, k=5, n_centroids=n_cent,
                                  n_probe=64, train_sample=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 200_000, len(plan)
    got = out.collect()
    assert len(got) == 5
    assert got[0].vec_id == 0  # the query vector itself ranks first


def test_ivf_assign_correctness(emb):
    cent = np.array([[1.0] + [0.0] * (DIM - 1),
                     [-1.0] + [0.0] * (DIM - 1)])
    got = {r.vec_id: r.ivf_list
           for r in similarity.ivf_assign(emb, cent).collect()}
    src = {r.vec_id: r.embedding for r in emb.collect()}
    for vid, lst in got.items():
        x = np.asarray(src[vid], dtype=np.float64)
        exp = int(np.argmin([((x - c) ** 2).sum() for c in cent]))
        assert lst == exp


def test_ivf_train_sample_deterministic(emb):
    a = similarity.ivf_train_sample(emb, 64)
    b = similarity.ivf_train_sample(emb, 64)
    assert np.array_equal(a, b)
    assert a.shape == (64, DIM)


def test_kmeans_fit_scale_memory():
    """4096 centroids x 1024 dims fits driver memory: the chunked
    matmul form peaks at O(chunk*k) (~32 MB), not the old
    O(sample*k*dim) broadcast tensor (~17 GB at this size)."""
    import resource

    rng = np.random.default_rng(7)
    x = rng.standard_normal((8192, 1024))
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    cent = similarity._kmeans_fit(x, 4096, iters=2, seed=1)
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert cent.shape == (4096, 1024)
    assert np.isfinite(cent).all()
    # linux ru_maxrss is KiB; allow 2 GiB of slack, far below the 17 GiB
    # the dense tensor would need
    assert (after - before) < 2 * 1024 * 1024


def test_kmeans_fit_deterministic():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((500, 32))
    a = similarity._kmeans_fit(x, 16, iters=5, seed=42)
    b = similarity._kmeans_fit(x, 16, iters=5, seed=42)
    assert np.array_equal(a, b)
