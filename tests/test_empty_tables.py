"""Every ``queries()`` entry must run (not necessarily return rows)
against zero-row tables with the standard schemas — the degenerate
input a 100 TB pipeline hits on empty partitions, fresh sinks, and
fully-filtered branches. Regression net for the r5 empty-input sweep:
ANN probe selection (``_query_vec`` on an empty embeddings table),
k-means/PQ training on an empty sample, and latest-wins reads with a
``tombstone_col`` that no delete has created yet."""
import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SRC, f))
            pq.write_table(t.slice(0, 0), str(d / f))
    return str(d)


# the five that crashed in the r5 sweep, plus one representative from
# each family that must stay degenerate-safe (the full 50-query sweep
# lives in the operators' own suites; these are the shapes with
# driver-side training/probe state that empty inputs can poison)
CASES = [
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivfpq_topk",
    "near_dup_pairs",
    "dml_upsert_delete_events",
    "rt_events",
    "latest_wins_events",
    "pack_concat_documents",
    "asof_join_events",
    "approx_quantile_events",
]


@pytest.mark.parametrize("name", CASES)
def test_query_runs_on_empty_tables(spark, empty_sf, name):
    df = entry_mod.queries()[name](spark, empty_sf)
    n = df.count()
    assert n >= 0  # ran to completion; shape intact
    assert len(df.columns) > 0


def test_pq_train_empty_corpus_raises_cleanly(spark):
    from oroch_spark.operators import similarity

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty training sample"):
        similarity.pq_train(emb)


def test_ann_empty_corpus_falls_back_exact(spark):
    from oroch_spark.operators import similarity

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    q = [1.0, 0.0, 0.0, 0.0]
    assert similarity.ann_topk_ivf(emb, q, k=3).count() == 0
    assert similarity.ann_topk_ivfpq(emb, q, k=3).count() == 0
    assert similarity.ann_topk_pq(emb, q, k=3).count() == 0
