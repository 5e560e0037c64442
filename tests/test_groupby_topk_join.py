"""Group-by/distinct pushdown, secondary-predicate aggregates,
DataFrame-keyed lookup join, and top-k-by-key pruning — the query
surface added on top of the zone-map/Bloom stack. Every result is
checked against a plain DataFrame computation on the source; pruning
is checked to actually skip blocks where the test controls layout."""
import numpy as np
import pyarrow as pa
import pytest

from pyspark.sql import Row, functions as F

from oroch_spark import engine
from oroch_spark.kernels import strings as sc

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    src = spark.read.parquet(f"{SF}/events.parquet")
    path = str(tmp_path_factory.mktemp("gtj") / "blocks")
    engine.encode_df(src, ["event_id"], n_buckets=4, block_rows=512) \
        .write.mode("overwrite").parquet(path)
    return src, spark.read.parquet(path), engine.column_kinds(src.schema)


# --- kernel: value counts straight off the codec -------------------------

def test_value_counts_dict_block():
    vals = ["a", "b", "a", "c", "a", "b"] * 50
    blob, d = sc.encode_str_block(pa.array(vals))
    got_v, got_c = sc.str_block_value_counts(blob, len(vals))
    got = dict(zip(got_v.to_pylist(), got_c.tolist()))
    assert got == {"a": 150, "b": 100, "c": 50}


def test_value_counts_rle_block():
    vals = ["x"] * 400 + ["y"] * 100 + ["x"] * 12
    blob, d = sc.encode_str_block(pa.array(vals))
    assert d.codec == sc.RLE_STR
    got_v, got_c = sc.str_block_value_counts(blob, len(vals))
    got = dict(zip(got_v.to_pylist(), got_c.tolist()))
    assert got == {"x": 412, "y": 100}


def test_value_counts_plain_block():
    vals = [f"unique-{i:05d}" for i in range(64)]
    blob, d = sc.encode_str_block(pa.array(vals))
    got_v, got_c = sc.str_block_value_counts(blob, len(vals))
    assert sorted(got_v.to_pylist()) == vals
    assert got_c.sum() == 64 and (got_c == 1).all()


# --- group_count / distinct_values ----------------------------------------

def test_group_count_string(spark, events):
    src, blocks, kinds = events
    got = {r["event_type"]: r["n_rows"]
           for r in engine.group_count(blocks, kinds,
                                       "event_type").collect()}
    exp = {r["event_type"]: r["cnt"]
           for r in src.groupBy("event_type")
                       .agg(F.count("*").alias("cnt")).collect()}
    assert got == exp


def test_group_count_integer(spark, events):
    src, blocks, kinds = events
    got = {r["user_id"]: r["n_rows"]
           for r in engine.group_count(blocks, kinds, "user_id").collect()}
    exp = {r["user_id"]: r["cnt"]
           for r in src.groupBy("user_id")
                       .agg(F.count("*").alias("cnt")).collect()}
    assert got == exp


def test_group_count_nullable(spark):
    rows = [Row(k=i, v="a" if i % 3 == 0 else (None if i % 3 == 1
                                               else "b"))
            for i in range(300)]
    src = spark.createDataFrame(rows)
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["k"], n_buckets=2, block_rows=64)
    got = {r["v"]: r["n_rows"]
           for r in engine.group_count(blocks, kinds, "v").collect()}
    assert got == {"a": 100, None: 100, "b": 100}


def test_distinct_values(spark, events):
    src, blocks, kinds = events
    got = sorted(r[0] for r in engine.distinct_values(
        blocks, kinds, "event_type").collect())
    exp = sorted(r[0] for r in src.select("event_type")
                 .distinct().collect())
    assert got == exp


# --- agg_where -------------------------------------------------------------

def test_agg_where_matches_source(spark, events):
    src, blocks, kinds = events
    got = engine.agg_where(blocks, kinds, "user_id", 2, 8,
                           "event_id").collect()[0]
    exp = (src.filter("user_id BETWEEN 2 AND 8")
              .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"),
                   F.min("event_id").alias("lo"),
                   F.max("event_id").alias("hi")).collect()[0])
    assert (got["n_rows"], got["sum_v"], got["min_v"], got["max_v"]) == \
        (exp["n"], exp["s"], exp["lo"], exp["hi"])


def test_agg_where_empty_range(spark, events):
    src, blocks, kinds = events
    got = engine.agg_where(blocks, kinds, "user_id", 10**9, 2 * 10**9,
                           "event_id").collect()[0]
    assert got["n_rows"] == 0 and got["sum_v"] is None


def test_agg_where_interior_blocks_answer_from_stats(spark):
    """On a table key-sorted by the predicate column, a wide range is
    answered almost entirely from metadata: force it by predicating on
    the lead key — every fully-contained block must come from the
    stats-only path (checked by equality with the source, with the
    layout guaranteeing interior blocks exist)."""
    rows = [Row(k=i, v=i % 97) for i in range(4096)]
    src = spark.createDataFrame(rows)
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["k"], n_buckets=1, block_rows=256)
    got = engine.agg_where(blocks, kinds, "k", 300, 3000, "v").collect()[0]
    exp = (src.filter("k BETWEEN 300 AND 3000")
              .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
                   F.min("v").alias("lo"), F.max("v").alias("hi"))
              .collect()[0])
    assert (got["n_rows"], got["sum_v"], got["min_v"], got["max_v"]) == \
        (exp["n"], exp["s"], exp["lo"], exp["hi"])


# --- lookup_join -----------------------------------------------------------

def test_lookup_join_matches_isin(spark, events):
    src, blocks, kinds = events
    keys = src.filter("event_type = 'signup'").select("event_id")
    got = engine.lookup_join(blocks, kinds, "event_id", keys) \
        .orderBy("event_id").collect()
    exp = src.join(keys, "event_id", "left_semi") \
        .orderBy("event_id").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in exp]


def test_lookup_join_projection(spark, events):
    src, blocks, kinds = events
    keys = spark.createDataFrame([Row(k=5), Row(k=50), Row(k=10**9)])
    got = engine.lookup_join(blocks, kinds, "event_id", keys,
                             columns=["user_id"]).collect()
    exp = src.filter(F.col("event_id").isin(5, 50)) \
        .select("user_id").collect()
    assert sorted(r["user_id"] for r in got) == \
        sorted(r["user_id"] for r in exp)
    assert got and got[0].asDict().keys() == {"user_id"}


def test_lookup_join_prunes_blocks(spark):
    """The bucketed prune must keep only blocks whose range can
    contain a probe key: single sorted bucket, 16 disjoint blocks,
    two point keys in the same block -> 1 candidate."""
    src = spark.createDataFrame([Row(k=i, v=i) for i in range(4096)])
    blocks = engine.encode_df(src, ["k"], n_buckets=1,
                              block_rows=256).persist()
    total = blocks.count()
    keys = spark.createDataFrame([Row(k=1), Row(k=2)])
    probe = F.broadcast(keys.selectExpr("k AS _probe_k").distinct())
    for gate in (0, 10**9):   # grid path AND direct-semi path
        cand = engine._bucketed_block_prune(
            blocks, ("key_lo", "key_hi"), "i64", probe,
            F.col("_probe_k").cast("long"), grid_min_blocks=gate).count()
        assert total == 16 and cand == 1, gate
    blocks.unpersist()


def test_lookup_join_plan_has_no_nested_loop(spark):
    """Round-4 plan pin: ABOVE the size gate (here: 1250 blocks >
    _LJ_GRID_MIN_BLOCKS with the default gate), a large probe list
    must NOT prune via BroadcastNestedLoopJoin (O(blocks x keys));
    the bucket grid turns it into BroadcastHashJoins, and the blocks
    table never shuffles."""
    src = spark.createDataFrame([Row(k=i, v=i) for i in range(20000)])
    blocks = engine.encode_df(src, ["k"], n_buckets=2,
                              block_rows=16).persist()
    assert blocks.count() >= engine._LJ_GRID_MIN_BLOCKS
    kinds = engine.column_kinds(src.schema)
    keys = spark.range(0, 100000, 3).withColumnRenamed("id", "k")
    out = engine.lookup_join(blocks, kinds, "k", keys)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() == len(range(0, 20000, 3))
    blocks.unpersist()


def test_lookup_join_wide_and_null_bound_blocks_kept(spark):
    """Blocks spanning more coarse buckets than the explode cap (or
    carrying null bounds) skip the prune but stay in the candidate
    set — pruning is never a correctness filter."""
    import pyspark.sql.types as T
    # one block spans the whole domain (interleaved keys), the rest
    # are narrow: prune must keep the wide block for any probe
    wide = [Row(k=i, v=i) for i in (0, 10**12)]
    narrow = [Row(k=i, v=i) for i in range(1000, 1512)]
    src = spark.createDataFrame(wide + narrow)
    blocks = engine.encode_df(src, ["k"], n_buckets=1, block_rows=512)
    kinds = engine.column_kinds(src.schema)
    keys = spark.createDataFrame([Row(k=0)])
    got = engine.lookup_join(blocks, kinds, "k", keys).collect()
    assert [(r.k, r.v) for r in got] == [(0, 0)]
    # null bounds: blank out the bound columns entirely
    nb = blocks.withColumn("key_lo", F.lit(None).cast("long")) \
               .withColumn("key_hi", F.lit(None).cast("long"))
    got = engine.lookup_join(nb, kinds, "k", keys).collect()
    assert [(r.k, r.v) for r in got] == [(0, 0)]


def test_lookup_join_string_key(spark):
    rows = [Row(name=f"conv-{i:04d}", v=i) for i in range(1000)]
    src = spark.createDataFrame(rows)
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["name"], n_buckets=2, block_rows=128)
    keys = spark.createDataFrame([Row(k="conv-0007"), Row(k="conv-0999"),
                                  Row(k="missing")])
    got = engine.lookup_join(blocks, kinds, "name", keys).collect()
    assert sorted(r["v"] for r in got) == [7, 999]


# --- topk_key --------------------------------------------------------------

def test_topk_desc_and_asc(spark, events):
    src, blocks, kinds = events
    for ascending in (False, True):
        got = [r["event_id"] for r in engine.topk_key(
            blocks, kinds, "event_id", 12, ascending=ascending).collect()]
        exp = [r["event_id"] for r in src.orderBy(
            F.col("event_id").asc() if ascending
            else F.col("event_id").desc()).limit(12).collect()]
        assert got == exp


def test_topk_overlap_safe_on_unsorted_blocks(spark, tmp_path):
    """Blocks written map-only from an UNSORTED file overlap freely;
    the prefix rule must still return the exact top-k (this is the
    layout where a naive cum-rows-by-key_hi rule loses rows)."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    ids = rng.permutation(5000).astype(np.int64)
    t = pa.table({"k": ids, "v": ids * 3})
    srcp = str(tmp_path / "unsorted.parquet")
    pq.write_table(t, srcp)
    blocks = engine.encode_parquet_maponly(spark, srcp, ["k"],
                                           block_rows=256)
    kinds = [("k", "i64"), ("v", "i64")]
    got = [r["k"] for r in engine.topk_key(blocks, kinds, "k", 10).collect()]
    assert got == list(range(4999, 4989, -1))
    got_a = [r["k"] for r in engine.topk_key(blocks, kinds, "k", 10,
                                             ascending=True).collect()]
    assert got_a == list(range(10))


def test_topk_k_larger_than_table(spark, events):
    src, blocks, kinds = events
    n = src.count()
    got = engine.topk_key(blocks, kinds, "event_id", n + 100).count()
    assert got == n


def test_topk_prunes_blocks(spark):
    """On a single-bucket sorted layout the candidate set must be the
    minimal tail: ~k rows of blocks, not the whole table."""
    rows = [Row(k=i, v=i) for i in range(4096)]
    src = spark.createDataFrame(rows)
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["k"], n_buckets=1,
                              block_rows=256).persist()
    try:
        from pyspark.sql import Window

        w = Window.partitionBy("bucket").orderBy(F.col("key_lo").desc())
        prev = F.coalesce(F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
        # reproduce the operator's candidate filter and count survivors
        b2 = blocks.withColumn("_prev", prev)
        t = b2.filter("_prev < 10").agg(F.min("key_lo")).collect()[0][0]
        survivors = blocks.filter(F.col("key_hi") >= t).count()
        assert survivors == 1  # 4096/256 = 16 blocks, top-10 needs 1
        got = [r["k"] for r in engine.topk_key(blocks, kinds, "k",
                                               10).collect()]
        assert got == list(range(4095, 4085, -1))
    finally:
        blocks.unpersist()


def test_topk_plan_never_shuffles_payload(spark, events):
    """Regression pin for the plan shape: the only shuffle Exchange in
    topk_key's plan is over the metadata projection — the payload
    column must never appear in any Exchange input."""
    import contextlib
    import io
    import re

    src, blocks, kinds = events
    df = engine.topk_key(blocks, kinds, "event_id", 10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # detail section: "(5) Exchange\nInput [...]: [...]"
    for m in re.finditer(r"\(\d+\) Exchange\nInput[^\n]*\n"
                         r"Arguments[^\n]*", plan):
        assert "payload" not in m.group(0)
    shuffles = re.findall(r"\(\d+\) Exchange\nInput \[(\d+)\]", plan)
    assert len(shuffles) == 1  # exactly one (metadata) shuffle
    assert int(shuffles[0]) <= 6  # narrow projection, not the table


def test_topk_string_key(spark):
    rows = [Row(name=f"conv-{i:04d}", v=i) for i in range(1000)]
    src = spark.createDataFrame(rows)
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["name"], n_buckets=2, block_rows=128)
    got = [r["name"] for r in engine.topk_key(blocks, kinds, "name",
                                              5).collect()]
    assert got == [f"conv-{i:04d}" for i in range(999, 994, -1)]
    got_a = [r["name"] for r in engine.topk_key(
        blocks, kinds, "name", 5, ascending=True).collect()]
    assert got_a == [f"conv-{i:04d}" for i in range(5)]


def test_agg_where_string_predicate(spark):
    rows = [Row(name=f"u-{i % 7}", v=i) for i in range(700)]
    src = spark.createDataFrame(rows)
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["name"], n_buckets=2, block_rows=64)
    got = engine.agg_where(blocks, kinds, "name", "u-2", "u-4",
                           "v").collect()[0]
    exp = (src.filter("name BETWEEN 'u-2' AND 'u-4'")
              .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
                   F.min("v").alias("lo"), F.max("v").alias("hi"))
              .collect()[0])
    assert (got["n_rows"], got["sum_v"], got["min_v"], got["max_v"]) == \
        (exp["n"], exp["s"], exp["lo"], exp["hi"])


# --- group_agg ---------------------------------------------------------------

def test_group_agg_single_col(spark, events):
    src, blocks, kinds = events
    got = {r["event_type"]: (r["n_rows"], r["sum_v"], r["min_v"],
                             r["max_v"])
           for r in engine.group_agg(blocks, kinds, "event_type",
                                     "user_id").collect()}
    exp = {r["event_type"]: (r["n"], r["s"], r["lo"], r["hi"])
           for r in src.groupBy("event_type")
           .agg(F.count("*").alias("n"), F.sum("user_id").alias("s"),
                F.min("user_id").alias("lo"),
                F.max("user_id").alias("hi")).collect()}
    assert got == exp


def test_group_agg_multi_col_count_only(spark, events):
    src, blocks, kinds = events
    got = {(r["event_type"], r["user_id"]): r["n_rows"]
           for r in engine.group_agg(blocks, kinds,
                                     ["event_type", "user_id"]).collect()}
    exp = {(r["event_type"], r["user_id"]): r["n"]
           for r in src.groupBy("event_type", "user_id")
           .agg(F.count("*").alias("n")).collect()}
    assert got == exp


def test_group_agg_rejects_float_agg(spark, events):
    src, blocks, kinds = events
    import pytest as _pytest
    with _pytest.raises(ValueError):
        engine.group_agg(blocks, kinds, "event_type", "value")


# --- topk_by (secondary column) ---------------------------------------------

def test_topk_by_secondary_column(spark, events):
    src, blocks, kinds = events
    for asc in (False, True):
        got = [r["event_id"] for r in engine.topk_by(
            blocks, kinds, "ts", 8, ascending=asc).collect()]
        exp = [r["event_id"] for r in src.orderBy(
            F.col("ts").asc() if asc else F.col("ts").desc())
            .limit(8).collect()]
        assert got == exp


def test_topk_by_prunes_on_correlated_column(spark):
    """ts correlates with the event_id block order, so the per-column
    stats prefix rule keeps only the tail blocks."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [Row(k=i, ts=base + datetime.timedelta(seconds=i))
            for i in range(4096)]
    src = spark.createDataFrame(rows, "k long, ts timestamp")
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["k"], n_buckets=1,
                              block_rows=256).persist()
    try:
        st = engine._col_stats("ts")
        meta = blocks.select("bucket", "n", st["lo"].alias("_lo"))
        from pyspark.sql import Window
        w = Window.partitionBy("bucket") \
            .orderBy(F.col("_lo").desc_nulls_last())
        prev = F.coalesce(F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
        t = meta.withColumn("_p", prev).filter("_p < 10") \
            .agg(F.min("_lo")).collect()[0][0]
        kept = blocks.filter(st["hi"] >= t).count()
        assert kept == 1  # 16 blocks, top-10 by ts needs the last one
        got = [r["k"] for r in engine.topk_by(blocks, kinds, "ts",
                                              10).collect()]
        assert got == list(range(4095, 4085, -1))
    finally:
        blocks.unpersist()


def test_group_agg_rejects_decimal_agg(spark):
    """dec(p,s) through the int64 kernel would interleave decimal128
    low/high words into garbage sums — must reject loudly."""
    import decimal

    from pyspark.sql import Row

    src = spark.createDataFrame(
        [Row(g="a", amount=decimal.Decimal("1.50"))],
        "g string, amount decimal(12,2)")
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["g"], n_buckets=1, block_rows=8)
    with pytest.raises(ValueError, match="dec"):
        engine.group_agg(blocks, kinds, "g", "amount")
