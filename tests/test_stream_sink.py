"""writeStream.format("oroch"): the incremental-encode contract as a
first-class streaming sink — per-batch manifests, exactly-once
committed view, latest-wins merge-on-read, batch-reader compat."""
import glob
import json
import os

import pytest
from pyspark.sql import Row

from oroch_spark import engine
from oroch_spark.sources import datasource as ds
from oroch_spark.streaming import incremental as inc

SCHEMA = "conv_id string, turn_idx int, text string"
KINDS = [("conv_id", "str"), ("turn_idx", "i32"), ("text", "str")]


@pytest.fixture(scope="module")
def sink(spark, tmp_path_factory):
    ds.register(spark)
    td = tmp_path_factory.mktemp("sink")
    srcdir = str(td / "in")
    os.makedirs(srcdir)
    rows1 = [Row(conv_id="c1", turn_idx=i, text=f"t{i}")
             for i in range(100)]
    rows2 = [Row(conv_id="c1", turn_idx=0, text="UPDATED")] + \
        [Row(conv_id="c2", turn_idx=i, text=f"u{i}") for i in range(50)]
    spark.createDataFrame(rows1, SCHEMA).coalesce(1) \
        .write.parquet(os.path.join(srcdir, "f1"))
    spark.createDataFrame(rows2, SCHEMA).coalesce(1) \
        .write.parquet(os.path.join(srcdir, "f2"))
    path = str(td / "out")
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(srcdir + "/*"))
    q = (stream.writeStream.format("oroch")
         .option("path", path)
         .option("key_cols", "conv_id,turn_idx")
         .option("text_cols", "text")
         .option("checkpointLocation", str(td / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return path


def test_per_batch_manifests(sink):
    mans = sorted(glob.glob(os.path.join(sink, "_batches", "*.json")))
    assert [os.path.basename(m) for m in mans] == ["0.json", "1.json"]
    for m in mans:
        with open(m) as f:
            doc = json.load(f)
        assert doc["files"] and doc["blocks"] > 0
        for fn in doc["files"]:
            assert os.path.exists(os.path.join(sink, fn))


def test_committed_view_and_batch_ids(spark, sink):
    blocks = ds.stream_sink_blocks(spark, sink)
    ids = sorted(r[0] for r in blocks.select("batch_id")
                 .distinct().collect())
    assert ids == [0, 1]
    # append-only: the re-sent key appears once per batch
    assert engine.decode_df(blocks, KINDS).count() == 151


def test_latest_wins_read(spark, sink):
    blocks = ds.stream_sink_blocks(spark, sink)
    latest = inc.read_latest(spark, None, KINDS,
                             ["conv_id", "turn_idx"], inc_blocks=blocks)
    assert latest.count() == 150
    got = latest.filter("conv_id = 'c1' AND turn_idx = 0").collect()
    assert [r["text"] for r in got] == ["UPDATED"]


def test_orphan_files_invisible(spark, sink):
    """A stray file (failed attempt) is not part of the committed view
    and is swept by the next commit's reconciliation (here: just
    invisible to the manifest-driven reader)."""
    import shutil

    some = glob.glob(os.path.join(sink, "stream-*.parquet"))[0]
    orphan = os.path.join(sink, "stream-99999-deadbeef.parquet")
    shutil.copy(some, orphan)
    try:
        blocks = ds.stream_sink_blocks(spark, sink)
        assert engine.decode_df(blocks, KINDS).count() == 151
    finally:
        os.remove(orphan)


def test_batch_reader_reads_sink(spark, sink):
    back = spark.read.format("oroch").load(sink)
    assert back.count() == 151
    assert set(back.columns) == {"conv_id", "turn_idx", "text"}


def test_stream_reader_decodes_committed_batches(spark, sink, tmp_path):
    """readStream.format("oroch") over the sink: decoded rows of every
    committed batch, exactly once across restarts (offsets = batch
    manifests; the stream checkpoint carries the consumed range)."""
    outdir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("oroch").load(sink)
             .writeStream.format("parquet").option("path", outdir)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    drain()
    df = spark.read.parquet(outdir)
    assert df.count() == 151  # append-only view of both batches
    assert set(df.columns) == {"conv_id", "turn_idx", "text"}
    assert df.filter("conv_id = 'c2' AND turn_idx = 7") \
        .collect()[0]["text"] == "u7"
    # a re-drain with the same checkpoint processes NOTHING new
    drain()
    assert spark.read.parquet(outdir).count() == 151


def test_as_of_batch_time_travel(spark, sink):
    blocks0 = ds.stream_sink_blocks(spark, sink, as_of_batch=0)
    assert engine.decode_df(blocks0, KINDS).count() == 100  # batch 0 only


def test_compact_sink(spark, tmp_path):
    """Compaction folds all batches into one manifest carrying the top
    batch id; the latest-wins view is identical before/after, and both
    the batch reader and a fresh stream drain see the compacted data
    exactly once."""
    import glob as g

    srcdir = str(tmp_path / "in")
    os.makedirs(srcdir)
    sink2 = str(tmp_path / "sink2")
    rows1 = [Row(conv_id="c1", turn_idx=i, text=f"t{i}")
             for i in range(100)]
    rows2 = [Row(conv_id="c1", turn_idx=0, text="UPDATED")] + \
        [Row(conv_id="c2", turn_idx=i, text=f"u{i}") for i in range(50)]
    spark.createDataFrame(rows1, SCHEMA).coalesce(1) \
        .write.parquet(os.path.join(srcdir, "f1"))
    spark.createDataFrame(rows2, SCHEMA).coalesce(1) \
        .write.parquet(os.path.join(srcdir, "f2"))
    q = (spark.readStream.schema(SCHEMA)
         .option("maxFilesPerTrigger", "1").parquet(srcdir + "/*")
         .writeStream.format("oroch").option("path", sink2)
         .option("key_cols", "conv_id,turn_idx")
         .option("text_cols", "text")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    before = inc.read_latest(
        spark, None, KINDS, ["conv_id", "turn_idx"],
        inc_blocks=ds.stream_sink_blocks(spark, sink2)) \
        .orderBy("conv_id", "turn_idx").toPandas()
    man = ds.compact_sink(spark, sink2, n_buckets=2, block_rows=64)
    assert man["batch_id"] == 1 and man["compacted"]
    mans = g.glob(os.path.join(sink2, "_batches", "*.json"))
    assert [os.path.basename(m) for m in mans] == ["1.json"]
    after = inc.read_latest(
        spark, None, KINDS, ["conv_id", "turn_idx"],
        inc_blocks=ds.stream_sink_blocks(spark, sink2)) \
        .orderBy("conv_id", "turn_idx").toPandas()
    assert before.equals(after)
    assert spark.read.format("oroch").load(sink2).count() == 150
    assert after[(after.conv_id == "c1")
                 & (after.turn_idx == 0)].text.iloc[0] == "UPDATED"
