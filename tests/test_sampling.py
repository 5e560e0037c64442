"""Deterministic sampling / splitting / mixing operators."""
import pytest
from pyspark.sql import functions as F

from oroch_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"conv{i % 97}", f"doc text {i}",
             ["hi", "mid", "lo"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(
        rows, "doc_id bigint, conv_id string, text string, tier string"
    ).cache()


def ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


class TestHashSample:
    def test_partitioning_invariant(self, docs):
        a = ids(sampling.hash_sample(docs, ["doc_id"], 0.3, seed=7))
        b = ids(sampling.hash_sample(docs.repartition(13), ["doc_id"],
                                     0.3, seed=7))
        assert a == b

    def test_rerun_identical_and_fraction_close(self, docs):
        a = ids(sampling.hash_sample(docs, ["doc_id"], 0.3, seed=7))
        b = ids(sampling.hash_sample(docs, ["doc_id"], 0.3, seed=7))
        assert a == b
        assert abs(len(a) / 3000 - 0.3) < 0.05

    def test_nested_fractions(self, docs):
        # a smaller fraction at the same seed is a SUBSET of a larger
        # one (threshold on the same hash) — lets pipelines grow a
        # sample without resampling what is already processed
        small = ids(sampling.hash_sample(docs, ["doc_id"], 0.1, seed=3))
        big = ids(sampling.hash_sample(docs, ["doc_id"], 0.5, seed=3))
        assert small <= big

    def test_aligned_across_tables(self, docs, spark):
        # sampling a sibling table on the same keys keeps aligned rows
        emb = docs.select("doc_id", F.lit(1).alias("v"))
        a = ids(sampling.hash_sample(docs, ["doc_id"], 0.25, seed=11))
        b = ids(sampling.hash_sample(emb, ["doc_id"], 0.25, seed=11))
        assert a == b

    def test_seed_changes_sample(self, docs):
        a = ids(sampling.hash_sample(docs, ["doc_id"], 0.3, seed=1))
        b = ids(sampling.hash_sample(docs, ["doc_id"], 0.3, seed=2))
        assert a != b

    def test_bad_fraction_rejected(self, docs):
        with pytest.raises(ValueError):
            sampling.hash_sample(docs, ["doc_id"], 1.5)


class TestSplitByKey:
    def test_disjoint_exhaustive_leakage_safe(self, docs):
        parts = sampling.split_by_key(
            docs, ["conv_id"], {"train": 0.8, "eval": 0.1, "test": 0.1},
            seed=5)
        got = {k: ids(v) for k, v in parts.items()}
        allids = set().union(*got.values())
        assert allids == ids(docs)
        assert not (got["train"] & got["eval"])
        assert not (got["train"] & got["test"])
        assert not (got["eval"] & got["test"])
        # leakage safety: every conv_id lands wholly on one side
        for name, df in parts.items():
            convs_here = {r.conv_id for r in df.select("conv_id")
                          .distinct().collect()}
            for other, odf in parts.items():
                if other == name:
                    continue
                oconvs = {r.conv_id for r in odf.select("conv_id")
                          .distinct().collect()}
                assert not (convs_here & oconvs)

    def test_fractions_must_sum_to_one(self, docs):
        with pytest.raises(ValueError):
            sampling.split_by_key(docs, ["conv_id"],
                                  {"a": 0.5, "b": 0.4})


class TestStratified:
    def test_per_stratum_fractions(self, docs):
        out = sampling.stratified_sample(
            docs, "tier", {"hi": 1.0, "mid": 0.5}, default_fraction=0.0,
            seed=9, key_cols=["doc_id"])
        pdf = (out.groupBy("tier").count().toPandas()
               .set_index("tier")["count"].to_dict())
        assert pdf.get("hi") == 1000          # keep-all stratum exact
        assert "lo" not in pdf                # default 0 drops stratum
        assert abs(pdf.get("mid", 0) / 1000 - 0.5) < 0.1

    def test_deterministic(self, docs):
        kw = dict(default_fraction=0.2, seed=4, key_cols=["doc_id"])
        a = ids(sampling.stratified_sample(docs, "tier", {"hi": 0.7}, **kw))
        b = ids(sampling.stratified_sample(docs.repartition(5), "tier",
                                           {"hi": 0.7}, **kw))
        assert a == b


class TestMixAndOrder:
    def test_epoch_order_deterministic_and_distinct_per_epoch(self, docs):
        e0 = sampling.epoch_order(docs, ["doc_id"], seed=1, epoch=0)
        e0b = sampling.epoch_order(docs.repartition(9), ["doc_id"],
                                   seed=1, epoch=0)
        e1 = sampling.epoch_order(docs, ["doc_id"], seed=1, epoch=1)
        o0 = {r.doc_id: r.epoch_order for r in e0.collect()}
        o0b = {r.doc_id: r.epoch_order for r in e0b.collect()}
        o1 = {r.doc_id: r.epoch_order for r in e1.collect()}
        assert o0 == o0b                      # cluster-size invariant
        assert o0 != o1                       # new permutation per epoch
        assert len(set(o0.values())) == len(o0)   # rank collisions absent

    def test_mix_weights_tags_and_determinism(self, docs, spark):
        web = docs.select("doc_id", "text")
        wiki = docs.select((F.col("doc_id") + 100000).alias("doc_id"),
                           "text")
        out = sampling.mix_datasets(
            {"web": (web, 0.2), "wiki": (wiki, 1.0)},
            key_cols=["doc_id"], seed=2, epoch=0)
        counts = {r.source: r["count"] for r in
                  out.groupBy("source").count().collect()}
        assert counts["wiki"] == 3000
        assert abs(counts["web"] / 3000 - 0.2) < 0.05
        out2 = sampling.mix_datasets(
            {"web": (web.repartition(17), 0.2), "wiki": (wiki, 1.0)},
            key_cols=["doc_id"], seed=2, epoch=0)
        a = {(r.source, r.doc_id): r.epoch_order for r in out.collect()}
        b = {(r.source, r.doc_id): r.epoch_order for r in out2.collect()}
        assert a == b
