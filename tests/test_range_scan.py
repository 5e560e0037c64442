"""Range scan over the persisted blocks table: zone-map pruning keeps
only overlapping blocks, results equal a source filter, and projections
compose with the range."""
from pyspark.sql import functions as F

from oroch_spark import engine


def _setup(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    kinds = engine.column_kinds(src.schema)
    path = str(tmp_path / "blocks")
    engine.encode_df(src, ["event_id"], n_buckets=4, block_rows=512) \
        .write.mode("overwrite").parquet(path)
    return src, kinds, spark.read.parquet(path)


def test_range_scan_matches_source(spark, tmp_path):
    src, kinds, blocks = _setup(spark, tmp_path)
    got = engine.range_scan(blocks, kinds, "event_id", 2000, 2500) \
        .orderBy("event_id").collect()
    exp = src.filter(F.col("event_id").between(2000, 2500)) \
        .orderBy("event_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def test_range_prune_skips_blocks(spark, tmp_path):
    _, _, blocks = _setup(spark, tmp_path)
    total = blocks.count()
    survivors = engine.prune_blocks_range(blocks, 2000, 2500).count()
    assert survivors < total
    # a 500-wide range over 10k ids in 512-row range-ordered blocks:
    # at most ~2 blocks per bucket overlap
    assert survivors <= 2 * 4


def test_range_count_metadata_pushdown(spark, tmp_path):
    src, kinds, blocks = _setup(spark, tmp_path)
    lo, hi = 1000, 8000
    got = engine.range_count(blocks, kinds, "event_id", lo, hi) \
        .collect()[0].n_rows
    exp = src.filter(F.col("event_id").between(lo, hi)).count()
    assert got == exp
    # most surviving blocks are interior: counted from metadata alone
    ov = engine.prune_blocks_range(blocks, lo, hi)
    interior = ov.filter((F.col("key_lo") >= lo)
                         & (F.col("key_hi") <= hi)).count()
    assert interior >= ov.count() - 2 * 4  # <= 2 boundary blocks/bucket
    assert interior > 0


def test_range_count_empty_range(spark, tmp_path):
    src, kinds, blocks = _setup(spark, tmp_path)
    got = engine.range_count(blocks, kinds, "event_id",
                             10**9, 2 * 10**9).collect()[0].n_rows
    assert got == 0


def test_range_scan_with_projection(spark, tmp_path):
    src, kinds, blocks = _setup(spark, tmp_path)
    got = engine.range_scan(blocks, kinds, "event_id", 100, 200,
                            columns=["user_id", "value"]) \
        .orderBy("user_id", "value").collect()
    exp = src.filter(F.col("event_id").between(100, 200)) \
        .select("user_id", "value").orderBy("user_id", "value").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
