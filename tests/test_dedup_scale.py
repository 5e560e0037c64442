"""exact_dedup scale-safety: the exchange key must be the 128-bit
fingerprint, not the document text, and results must match the
content-keyed oracle plan on data with genuine duplicates."""
import pytest

from pyspark.sql import functions as F

from oroch_spark.operators import dedup


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dups = docs.limit(7).withColumn("doc_id",
                                    F.col("doc_id") + F.lit(100000))
    return docs.unionByName(dups)


def test_exchange_key_is_hash_not_text(docs_with_dups):
    plan = dedup.exact_dedup(docs_with_dups) \
        ._jdf.queryExecution().executedPlan().toString()
    ex = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert ex, plan
    for ln in ex:
        # partitioning key is the pair of xxhash64 longs, never text
        assert "text" not in ln, ln
    assert "xxhash64(text" in plan  # hash computed below the exchange
    assert "partial_min" in plan    # map-side combine before the wire


def test_matches_content_keyed_oracle_plan(docs_with_dups):
    a = dedup.exact_dedup(docs_with_dups).orderBy("doc_id").collect()
    b = dedup.exact_dedup_by_content(docs_with_dups) \
        .orderBy("doc_id").collect()
    assert [(r.doc_id, r.text, r.dup_cnt) for r in a] == \
        [(r.doc_id, r.text, r.dup_cnt) for r in b]
    assert any(r.dup_cnt == 2 for r in a)  # the planted dups collapsed


def test_verify_flag_reports_collision_free(docs_with_dups):
    out = dedup.exact_dedup(docs_with_dups, verify=True)
    assert out.filter(~F.col("collision_free")).count() == 0
