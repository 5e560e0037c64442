"""MinHash LSH bucket-size cap: a degenerate boilerplate bucket must not
trigger a quadratic self-join, while normal-size buckets keep pairing."""
from pyspark.sql import functions as F

from oroch_spark.operators import dedup


def _fixture(spark):
    # 200 identical boilerplate docs (one hot bucket per band) + one
    # genuine near-dup pair + filler
    boiler = [(i, "the same boilerplate footer text repeated on every "
                  "page of the crawl " * 3) for i in range(200)]
    base = ("a genuinely unique document about compression codecs and "
            "columnar storage engines with enough words to shingle")
    pair = [(1000, base + " alpha"), (1001, base + " beta")]
    filler = [(2000 + i, f"completely unrelated filler number {i} with "
               f"random words {i * 7} {i * 13} {i * 29}")
              for i in range(20)]
    return spark.createDataFrame(boiler + pair + filler,
                                 "doc_id long, text string")


def test_cap_skips_hot_bucket_keeps_normal_pairs(spark):
    docs = _fixture(spark)
    cands = dedup.minhash_lsh_candidates(docs, num_hashes=32, bands=16,
                                         max_bucket=100)
    rows = cands.collect()
    ids = {(r.id_a, r.id_b) for r in rows}
    # the quadratic cluster is skipped: far fewer than 200*199/2 pairs
    assert len(rows) < 1000
    # the normal-size near-dup pair still surfaces
    assert (1000, 1001) in ids


def test_uncapped_finds_the_quadratic_cluster(spark):
    docs = _fixture(spark).filter(F.col("doc_id") < 50)  # keep it small
    cands = dedup.minhash_lsh_candidates(docs, num_hashes=16, bands=4,
                                         max_bucket=None)
    assert cands.count() == 50 * 49 // 2
