"""Winnowing fingerprint property: documents sharing a long enough word
run must share at least one fingerprint (guarantee window: any common
run of >= k+window-1 words); disjoint documents share none."""
from pyspark.sql import functions as F

from oroch_spark.operators import textstats


def test_shared_run_shares_fingerprint(spark):
    shared = " ".join(f"common{i}" for i in range(12))  # >= k+w-1 = 8
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma " + shared + " delta"),
         (2, shared + " epsilon zeta eta theta"),
         (3, " ".join(f"other{i}" for i in range(30)))],
        "doc_id long, text string")
    fps = {r.doc_id: set(r.fingerprints)
           for r in textstats.winnow_fingerprint(docs).collect()}
    assert fps[1] & fps[2], "shared 12-word run must collide"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_short_doc_single_fingerprint(spark):
    docs = spark.createDataFrame([(1, "just three words")],
                                 "doc_id long, text string")
    out = textstats.winnow_fingerprint(docs).collect()[0]
    assert len(out.fingerprints) == 1
