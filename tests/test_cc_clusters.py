"""Connected-components dedup clustering: alternating large-star /
small-star vs an exact Python union-find, adversarial graph shapes
(path, star hub), singletons, and the end-to-end near-dup pipeline."""
import random

import pytest

from pyspark.sql import functions as F

from oroch_spark.operators import dedup


def _union_find_components(n_nodes, pairs):
    """Exact oracle: min-label components via union-find."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, label by component min (root IS the min
    # because unions always point the larger root at the smaller)
    return {x: find(x) for x in range(n_nodes)}


def _cc_dict(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    n = 300
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    pairs = [(a, b) for a, b in pairs if a != b]
    expect = _union_find_components(n, pairs)
    got = _cc_dict(dedup.connected_components(
        spark.createDataFrame(pairs, "id_a: long, id_b: long")))
    # the Spark result covers exactly the non-singleton nodes
    touched = {x for p in pairs for x in p}
    assert set(got) == touched
    for x in touched:
        assert got[x] == expect[x]


def test_path_graph_converges_in_log_rounds(spark):
    # a 512-node path is the classic worst case for label propagation
    # (O(n) rounds); large-star/small-star must close it in O(log n).
    n = 512
    pairs = [(i, i + 1) for i in range(n - 1)]
    out = dedup.connected_components(
        spark.createDataFrame(pairs, "id_a: long, id_b: long"),
        max_iters=10)  # 10 rounds IS the log-n bound being asserted
    comps = _cc_dict(out)
    assert set(comps.values()) == {0}
    assert len(comps) == n


def test_star_hub_and_string_ids(spark):
    # high-degree hub: per-node work must stay aggregate-shaped; also
    # exercises lexicographic (string) node ids.
    pairs = [("hub", f"leaf{i:04d}") for i in range(500)]
    out = dedup.connected_components(
        spark.createDataFrame(pairs, "id_a: string, id_b: string"))
    comps = _cc_dict(out)
    assert len(comps) == 501
    assert set(comps.values()) == {"hub"}  # 'hub' < 'leaf...'


def test_empty_and_self_pairs(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "id_a: long, id_b: long")
    assert dedup.connected_components(df).count() == 0


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id: long, text: string")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)],
                                  "id_a: long, id_b: long")
    got = {r["doc_id"]: r["component"]
           for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_near_dup_dedup_end_to_end(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    # plant a 3-chain of near-identical docs off one source row:
    # base ~ base+suffix ~ base+suffix2 (chain through shared shingles)
    base = docs.limit(1).collect()[0]
    extra = spark.createDataFrame(
        [(900001, base["text"] + " tail one"),
         (900002, base["text"] + " tail one two")],
        "doc_id: long, text: string")
    alld = docs.select("doc_id", "text").unionByName(extra)
    kept = dedup.near_dup_dedup(alld, threshold=0.6, max_bucket=None)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # the cluster {base, 900001, 900002} survives only through its min
    assert base["doc_id"] in kept_ids
    assert 900001 not in kept_ids and 900002 not in kept_ids
    # nothing else got clustered away unless it truly paired: survivors
    # + removed = universe
    assert kept.count() < alld.count()
    clusters = dedup.dedup_clusters(
        alld, dedup.jaccard_pairs(
            alld, dedup.minhash_lsh_candidates(alld, max_bucket=None),
            threshold=0.6).select("id_a", "id_b"))
    assert clusters.count() == alld.count()
    survivors = clusters.filter(
        F.col("doc_id") == F.col("component")).count()
    assert survivors == kept.count()


def test_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(64)],
                                  "id_a: long, id_b: long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup.connected_components(pairs, max_iters=1)
