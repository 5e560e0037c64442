"""Structured Streaming incremental encode (oroch_spark.streaming):
micro-batches encode through the same kernels and append self-contained
blocks; the decoded union is bit-identical to everything ingested."""
import os

import pytest

from oroch_spark import engine, transcripts
from oroch_spark.streaming import incremental


def test_stream_encode_availablenow(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "out")
    os.makedirs(src_dir)
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    df = transcripts.generate(spark, 30, seed=3)
    df.persist()
    (df.repartition(3, "conv_id")
       .write.mode("overwrite").parquet(src_dir))

    stream = (spark.readStream.schema(transcripts.SCHEMA)
              .option("maxFilesPerTrigger", 2)
              .parquet(src_dir))
    q = incremental.encode_stream(
        stream, out_dir, ["conv_id", "turn_idx"], n_buckets=4,
        block_rows=256, text_cols=["text"], trigger_once=True)
    q.awaitTermination(120)

    blocks = incremental.read_stream_blocks(spark, out_dir)
    # multiple micro-batches, each with its own batch id
    assert blocks.select("batch_id").distinct().count() >= 2
    dec = engine.decode_df(
        blocks.drop("batch_id"), engine.column_kinds(df.schema))
    assert dec.count() == df.count()
    assert engine.checksum_df(dec) == engine.checksum_df(df)
    df.unpersist()
