"""Sequence-packing operators: concat-and-chunk + no-split BFD."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from oroch_spark.operators import packing

BUDGET = 128


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.RandomState(42)
    lens = rng.randint(1, 100, size=2000)
    lens[::97] = 0                       # some empty docs
    lens[::151] = 200                    # some oversize (> BUDGET) docs
    rows = [(int(i), int(n)) for i, n in enumerate(lens)]
    return spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint") \
        .cache()


class TestPackConcat:
    def test_slices_tile_documents_and_packs(self, spark, docs):
        out = packing.pack_concat(docs, ["doc_id"], "n_tokens", BUDGET,
                                  n_buckets=8).toPandas()
        src = docs.toPandas().set_index("doc_id")["n_tokens"]
        # every document's slices tile [0, n) exactly
        for doc_id, g in out.groupby("doc_id"):
            g = g.sort_values("doc_from")
            n = src[doc_id]
            if n == 0:
                assert len(g) == 1 and (g.doc_from == g.doc_to).all()
                continue
            assert g.doc_from.iloc[0] == 0
            assert g.doc_to.iloc[-1] == n
            assert (g.doc_from.iloc[1:].to_numpy()
                    == g.doc_to.iloc[:-1].to_numpy()).all()
        # every pack except each bucket's last is exactly BUDGET tokens
        out["slice"] = out.doc_to - out.doc_from
        per_pack = out.groupby(["bucket", "pack_id"])["slice"].sum()
        for b in per_pack.index.get_level_values(0).unique():
            tok = per_pack[b].sort_index()
            assert (tok.iloc[:-1] == BUDGET).all()
            assert tok.iloc[-1] <= BUDGET
        # within a pack, slices tile [0, ...) contiguously
        for (_, _), g in out[out.slice > 0].groupby(["bucket", "pack_id"]):
            g = g.sort_values("pack_offset")
            assert g.pack_offset.iloc[0] == 0
            ends = (g.pack_offset + g.slice).to_numpy()
            assert (g.pack_offset.iloc[1:].to_numpy() == ends[:-1]).all()

    def test_matches_sql_window_oracle(self, spark, docs):
        """DuckDB recomputes the same plan from the same bucket+order."""
        duckdb = pytest.importorskip("duckdb")
        out = packing.pack_concat(docs, ["doc_id"], "n_tokens", BUDGET,
                                  n_buckets=4, seed=9)
        spark_pdf = out.toPandas().sort_values(
            ["doc_id", "pack_id"]).reset_index(drop=True)
        # bucket values come from xxhash64 (Spark-side); feed them to
        # the oracle rather than reimplementing the hash
        withb = packing._with_bucket(docs, ["doc_id"], 4, 9).toPandas()
        con = duckdb.connect()
        con.register("d", withb)
        oracle = con.execute(f"""
            WITH c AS (
              SELECT doc_id, bucket, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY bucket
                         ORDER BY doc_id ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) - n_tokens AS start
              FROM d),
            s AS (
              SELECT *,
                CAST(FLOOR(start / {BUDGET}) AS BIGINT) AS p0,
                CAST(FLOOR((start + GREATEST(n_tokens,1) - 1)
                     / {BUDGET}) AS BIGINT) AS p1
              FROM c)
            SELECT doc_id, bucket, u.pack_id,
                   GREATEST(u.pack_id*{BUDGET} - start, 0) AS doc_from,
                   LEAST(n_tokens, (u.pack_id+1)*{BUDGET} - start)
                       AS doc_to,
                   GREATEST(start - u.pack_id*{BUDGET}, 0) AS pack_offset
            FROM s, UNNEST(range(p0, p1+1)) AS u(pack_id)
            ORDER BY doc_id, u.pack_id
        """).fetchdf().reset_index(drop=True)
        oracle = oracle.astype(spark_pdf.dtypes.to_dict())
        pd.testing.assert_frame_equal(spark_pdf, oracle)

    def test_deterministic_across_partitioning(self, docs):
        a = packing.pack_concat(docs, ["doc_id"], "n_tokens", BUDGET,
                                n_buckets=8).toPandas()
        b = packing.pack_concat(docs.repartition(13), ["doc_id"],
                                "n_tokens", BUDGET, n_buckets=8).toPandas()
        key = ["doc_id", "pack_id"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))

    def test_no_python_in_plan(self, docs):
        plan = packing.pack_concat(docs, ["doc_id"], "n_tokens", BUDGET) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


class TestPackBfd:
    def test_invariants(self, docs):
        out = packing.pack_bfd(docs, ["doc_id"], "n_tokens", BUDGET,
                               n_buckets=8).toPandas()
        src = docs.toPandas()
        # every doc exactly once
        assert sorted(out.doc_id) == sorted(src.doc_id)
        # oversize flag matches, and oversize packs are singletons
        assert (out.oversize == (out.n_tokens > BUDGET)).all()
        per = out.groupby(["bucket", "pack_id"])
        for (_, _), g in per:
            if g.oversize.any():
                assert len(g) == 1
            else:
                assert g.n_tokens.sum() <= BUDGET
            # offsets tile the pack contiguously in some order
            g = g.sort_values("pack_offset")
            ends = (g.pack_offset + g.n_tokens).to_numpy()
            assert g.pack_offset.iloc[0] == 0
            assert (g.pack_offset.iloc[1:].to_numpy() == ends[:-1]).all()

    def test_same_length_docs_cohabit(self, spark):
        rows = [(i, 10) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        out = packing.pack_bfd(df, ["doc_id"], "n_tokens", 100,
                               n_buckets=1).toPandas()
        # 40 docs x 10 tokens at budget 100 -> exactly 4 full packs
        per = out.groupby("pack_id")["n_tokens"].sum()
        assert len(per) == 4
        assert (per == 100).all()

    def test_utilization_high_on_small_docs(self, spark):
        rng = np.random.RandomState(7)
        rows = [(int(i), int(n))
                for i, n in enumerate(rng.randint(1, 33, size=4000))]
        df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        out = packing.pack_bfd(df, ["doc_id"], "n_tokens", 512,
                               n_buckets=4)
        stats = packing.packing_stats(out, 512).toPandas()
        assert (stats.fill_ratio > 0.95).all()

    def test_deterministic_across_partitioning(self, docs):
        a = packing.pack_bfd(docs, ["doc_id"], "n_tokens", BUDGET,
                             n_buckets=8).toPandas()
        b = packing.pack_bfd(docs.repartition(17), ["doc_id"],
                             "n_tokens", BUDGET, n_buckets=8).toPandas()
        key = ["doc_id"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))

    def test_zero_token_docs_parked(self, spark):
        rows = [(1, 0), (2, 0), (3, 50)]
        df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        out = packing.pack_bfd(df, ["doc_id"], "n_tokens", 64,
                               n_buckets=1).toPandas()
        assert len(out) == 3
        assert (out[out.n_tokens == 0].pack_id == 0).all()

    def test_histogram_kernel_vs_bruteforce_invariants(self):
        rng = np.random.RandomState(3)
        for trial in range(20):
            B = int(rng.randint(10, 60))
            lens = rng.randint(1, B + 1, size=int(rng.randint(1, 300)))
            lens = np.sort(lens)[::-1].astype(np.int64)
            assign = packing._bfd_histogram(lens, B)
            loads = np.bincount(assign, weights=lens)
            assert (loads <= B).all()
            assert loads.min() > 0          # dense pack ids
            # not worse than next-fit-decreasing baseline
            nfd_packs, acc = 1, 0
            for v in lens:
                if acc + v > B:
                    nfd_packs += 1
                    acc = 0
                acc += v
            assert len(loads) <= nfd_packs
