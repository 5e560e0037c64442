"""Product-quantization codec + ADC search (similarity.pq_*)."""
import numpy as np
import pytest

from pyspark.sql import functions as F

from oroch_spark.operators import similarity

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row[0]]


def test_pq_codes_shape_and_determinism(spark, emb):
    books = similarity.pq_train(emb, m=8, ksub=32)
    assert books.shape[0] == 8 and books.shape[1] == 32
    codes = similarity.pq_encode(emb, books).collect()
    assert all(len(r.pq_code) == 8 for r in codes)
    # deterministic: re-train + re-encode gives identical codes
    books2 = similarity.pq_train(emb, m=8, ksub=32)
    np.testing.assert_array_equal(books, books2)
    codes2 = dict((r.vec_id, bytes(r.pq_code))
                  for r in similarity.pq_encode(emb, books2).collect())
    for r in codes:
        assert codes2[r.vec_id] == bytes(r.pq_code)


def test_pq_reconstruction_error_bounded(spark, emb):
    """Lossy codec sanity: mean relative L2 reconstruction error well
    below 1 (random codes would be ~sqrt(2) for gaussian data)."""
    books = similarity.pq_train(emb, m=8, ksub=32)
    codes = similarity.pq_encode(emb, books)
    rec = similarity.pq_reconstruct(codes, books) \
        .withColumnRenamed("embedding", "approx")
    joined = emb.join(rec, "vec_id").select("vec_id", "embedding", "approx")
    pdf = joined.toPandas()
    x = np.array([np.asarray(v, np.float64) for v in pdf.embedding])
    xa = np.array([np.asarray(v, np.float64) for v in pdf.approx])
    rel = np.linalg.norm(x - xa, axis=1) / np.linalg.norm(x, axis=1)
    assert rel.mean() < 0.75


def test_pq_adc_matches_reconstructed_cosine(spark, emb, qvec):
    """ADC is EXACTLY the cosine of (query, reconstructed vector) —
    the lookup tables are an identity, not an approximation."""
    books = similarity.pq_train(emb, m=8, ksub=32)
    codes = similarity.pq_encode(emb, books)
    adc = similarity.pq_adc_scores(codes, books, qvec).toPandas() \
        .set_index("vec_id").adc_cosine
    rec = similarity.pq_reconstruct(codes, books)
    q = np.asarray(qvec, np.float64)
    pdf = rec.toPandas()
    for vid, v in zip(pdf.vec_id, pdf.embedding):
        x = np.asarray(v, np.float64)
        expect = float(x @ q / (np.linalg.norm(x) * np.linalg.norm(q)))
        # reconstruct emits array<float> (float32); ADC keeps float64
        assert abs(adc[vid] - expect) < 1e-6


def test_pq_topk_recall_vs_exact(spark, emb, qvec):
    """Gaussian embeddings have no cluster structure, the worst case
    for PQ distortion (like IVF needing 12/16 probes) — ksub=64 codes
    with a 150/500 ADC shortlist recover >=9 of the exact top-10;
    clustered real-embedding corpora need far smaller shortlists."""
    exact = {r.vec_id for r in
             similarity.cosine_topk(emb, qvec, k=10).collect()}
    approx = {r.vec_id for r in
              similarity.ann_topk_pq(emb, qvec, k=10, ksub=64,
                                     shortlist=150).collect()}
    assert len(exact & approx) >= 9


def test_pq_bad_dims_raise(spark, emb, qvec):
    with pytest.raises(ValueError):
        similarity.pq_train(emb, m=7)  # 64 % 7 != 0
    books = similarity.pq_train(emb, m=8, ksub=16)
    codes = similarity.pq_encode(emb, books)
    with pytest.raises(ValueError):
        similarity.pq_adc_scores(codes, books, qvec[:32])


def test_ivfpq_topk_recall_vs_exact(spark, emb, qvec):
    """IVF x PQ composed (non-residual IVFADC): probing 12/16 lists and
    ADC-scoring only within them must still recover >=9 of the exact
    top-10 on gaussian worst-case embeddings."""
    exact = {r.vec_id for r in
             similarity.cosine_topk(emb, qvec, k=10).collect()}
    approx = {r.vec_id for r in
              similarity.ann_topk_ivfpq(emb, qvec, k=10, n_probe=12,
                                        ksub=64, shortlist=150).collect()}
    assert len(exact & approx) >= 9


def test_ivfpq_residual_recall_small_shortlist(spark, emb, qvec):
    """Round 4: residual coding (per-list ADC tables) must hold >=9/10
    recall with a SMALLER shortlist (<=100) than the non-residual
    variant needed (150) — the precision the residual buys."""
    exact = {r.vec_id for r in
             similarity.cosine_topk(emb, qvec, k=10).collect()}
    approx = {r.vec_id for r in
              similarity.ann_topk_ivfpq(emb, qvec, k=10, n_probe=12,
                                        ksub=64, shortlist=100,
                                        residual=True).collect()}
    assert len(exact & approx) >= 9


def test_ivfpq_residual_beats_raw_adc_fidelity(spark, emb, qvec):
    """Residual ADC scores should track true cosine more closely than
    raw-vector ADC at the same (m, ksub): compare mean absolute error
    over the probed candidates."""
    sample = similarity.ivf_train_sample(emb, 512)
    cent = similarity._kmeans_fit(sample, 16, 5, 42)
    q = np.array(qvec)
    probes = np.argsort(((cent - q) ** 2).sum(axis=1))[:12]
    cand = (similarity.ivf_assign(emb, cent)
            .filter(F.col("ivf_list").isin([int(p) for p in probes])))
    res = similarity._ivfpq_residual_scores(
        cand, cent, similarity._pq_train_residual(sample, cent, 8, 64,
                                                  10, 42),
        qvec, probes, "vec_id", "embedding").toPandas()
    books = similarity.pq_train(emb, m=8, ksub=64)
    raw = similarity.pq_adc_scores(
        similarity.pq_encode(cand.select("vec_id", "embedding"), books),
        books, qvec).toPandas()
    qn = float(np.sqrt((np.array(qvec) ** 2).sum()))
    qarr = F.array(*[F.lit(float(x)).cast("float") for x in qvec])
    cos = (similarity._dot(F.col("embedding"), qarr)
           / (F.greatest(similarity._norm(F.col("embedding")),
                         F.lit(1e-30)) * F.lit(qn)))
    truth = cand.select("vec_id", cos.alias("cosine")).toPandas()
    t = truth.set_index("vec_id")["cosine"]
    err_res = (res.set_index("vec_id")["adc_cosine"] - t).abs().mean()
    err_raw = (raw.set_index("vec_id")["adc_cosine"] - t).abs().mean()
    assert err_res < err_raw
