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


@pytest.fixture(scope="module")
def one_row_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_one")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SRC, f))
            pq.write_table(t.slice(0, 1), str(d / f))
    return str(d)


@pytest.mark.parametrize("name", CASES)
def test_query_runs_on_single_row_tables(spark, one_row_sf, name):
    # n=1 exercises the n<5 trivial-codec cutoff, single-block zone
    # maps, and single-element training samples
    df = entry_mod.queries()[name](spark, one_row_sf)
    assert df.count() >= 0


@pytest.fixture(scope="module")
def null_heavy_sf(tmp_path_factory):
    """events with an ALL-null float column and ~50% nulls everywhere
    but the key — the validity-bitmap stress shape."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import shutil

    d = tmp_path_factory.mktemp("sf_nulls")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SRC, f), str(d / f))
    src = pq.read_table(os.path.join(SRC, "events.parquet"))
    n = src.num_rows
    rng = np.random.default_rng(7)
    cols = {}
    for name in src.schema.names:
        arr = src.column(name).combine_chunks()
        if name == "event_id":
            cols[name] = arr
        elif name == "value":
            cols[name] = pa.nulls(n, arr.type)
        else:
            mask = pa.array(rng.random(n) < 0.5)
            cols[name] = pc.if_else(mask, pa.nulls(n, arr.type), arr)
    pq.write_table(pa.table(cols), str(d / "events.parquet"))
    return str(d)


def test_null_heavy_roundtrip_bit_identical(spark, null_heavy_sf):
    rt = entry_mod.queries()["rt_events"](spark, null_heavy_sf)
    src = spark.read.parquet(
        os.path.join(null_heavy_sf, "events.parquet")).select(*rt.columns)
    assert rt.exceptAll(src).count() == 0
    assert src.exceptAll(rt).count() == 0
    assert rt.count() == src.count()


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
