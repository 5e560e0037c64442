"""Streaming analytics: watermarked window counts match batch ground
truth for closed windows (event-time-ordered arrival), and the
applyInPandasWithState conversation progress operator is exact across
micro-batch splits."""
import os
import time

from pyspark.sql import functions as F

from oroch_spark import transcripts
from oroch_spark.streaming import windowed


def _write_hash_batches(spark, tmp_path, n_conv=15, seed=8, files=4):
    src = str(tmp_path / "incoming")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    df = transcripts.generate(spark, n_conv, seed=seed).persist()
    df.repartition(files, "conv_id").write.mode("overwrite").parquet(src)
    return src, df


def _write_time_ordered(spark, tmp_path, n_conv=20, seed=6, slices=3):
    """Sequential per-time-slice writes with separated mtimes: the file
    stream source orders batches by modification time, so arrival is
    event-time ordered — the regime where append-mode watermark counts
    are exact."""
    src = str(tmp_path / "incoming")
    os.makedirs(src, exist_ok=True)
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    df = transcripts.generate(spark, n_conv, seed=seed).persist()
    dfu = df.withColumn("_us", F.unix_micros("ts"))
    qs = dfu.approxQuantile("_us",
                            [i / slices for i in range(1, slices)], 0.001)
    bounds = [None] + qs + [None]
    for i in range(slices):
        part = dfu
        if bounds[i] is not None:
            part = part.filter(F.col("_us") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("_us") <= bounds[i + 1])
        part.drop("_us").coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.2)  # separate mtimes -> deterministic batch order
    return src, df


def test_windowed_counts_append_watermark_exact_when_ordered(
        spark, tmp_path):
    src, df = _write_time_ordered(spark, tmp_path)
    stream = (spark.readStream.schema(transcripts.SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    counts = windowed.windowed_event_counts(
        stream, ts_col="ts", window="1 hour", watermark="30 minutes")
    q = (counts.writeStream.format("memory").queryName("win_append")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.win_start, r.win_end): r.n_events
           for r in spark.sql("SELECT * FROM win_append").collect()}
    truth = _truth_windows(df)
    # every window the watermark closed must match the batch count
    assert got, "no windows emitted"
    for k, v in got.items():
        assert truth[k] == v, (k, v, truth[k])
    df.unpersist()


def test_windowed_counts_update_mode_exact(spark, tmp_path):
    # hash-partitioned (out-of-order) arrival + watermark wider than the
    # data span: nothing is ever late, update mode re-emits growing
    # counts, and the max per window equals the batch ground truth
    src, df = _write_hash_batches(spark, tmp_path, n_conv=20, seed=6)
    stream = (spark.readStream.schema(transcripts.SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    counts = windowed.windowed_event_counts(
        stream, ts_col="ts", window="1 hour", watermark="2400 hours")
    q = (counts.writeStream.format("memory").queryName("win_update")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.win_start, r.win_end): r.n_events
           for r in (spark.sql("SELECT * FROM win_update")
                     .groupBy("win_start", "win_end")
                     .agg(F.max("n_events").alias("n_events"))
                     .collect())}
    assert got == _truth_windows(df)
    df.unpersist()


def _truth_windows(df):
    return {(r.win_start, r.win_end): r.n_events
            for r in (df.groupBy(F.window("ts", "1 hour"))
                      .agg(F.count("*").alias("n_events"))
                      .select(F.col("window.start").alias("win_start"),
                              F.col("window.end").alias("win_end"),
                              "n_events").collect())}


def test_conversation_progress_exact_across_microbatches(spark, tmp_path):
    src, df = _write_hash_batches(spark, tmp_path, n_conv=15, seed=8)
    stream = (spark.readStream.schema(transcripts.SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    prog = windowed.conversation_progress(stream)
    q = (prog.writeStream.format("memory").queryName("conv_prog")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    # latest update per conversation == batch ground truth
    final = (spark.sql("SELECT * FROM conv_prog")
             .groupBy("conv_id")
             .agg(F.max("n_turns").alias("n_turns"),
                  F.min("first_us").alias("first_us"),
                  F.max("last_us").alias("last_us"),
                  F.max("n_user").alias("n_user"),
                  F.max("n_assistant").alias("n_assistant")))
    truth = (df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.min(F.unix_micros("ts")).alias("first_us"),
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .alias("n_assistant")))
    g = {r.conv_id: r for r in final.collect()}
    t = {r.conv_id: r for r in truth.collect()}
    assert set(g) == set(t)
    for cid in t:
        assert (g[cid].n_turns, g[cid].n_user, g[cid].n_assistant) == \
            (t[cid].n_turns, t[cid].n_user, t[cid].n_assistant), cid
        assert g[cid].first_us == t[cid].first_us
        assert g[cid].last_us == t[cid].last_us
    df.unpersist()


def test_streaming_exact_dedup_across_microbatches(spark, tmp_path):
    """Duplicates arriving in LATER micro-batches are dropped by the
    fingerprint state; distinct docs all survive exactly once."""
    from oroch_spark.operators import dedup

    src = str(tmp_path / "docs_in")
    os.makedirs(src, exist_ok=True)
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    base = [(i, f"doc body {i % 40}",    # 40 distinct contents
             f"2024-01-01 10:{i % 50:02d}:00") for i in range(120)]
    df = (spark.createDataFrame(base, "doc_id bigint, text string, "
                                "s string")
          .withColumn("ts", F.col("s").cast("timestamp")).drop("s")
          .persist())
    # three sequential file slices so duplicates straddle micro-batches
    for k in range(3):
        df.filter(F.col("doc_id") % 3 == k).coalesce(1) \
            .write.mode("append").parquet(src)
        time.sleep(1.2)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = dedup.streaming_exact_dedup(stream, content_col="text",
                                      ts_col="ts", watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("sdedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("sdedup").toPandas()
    assert len(got) == 40
    assert sorted(got.text.unique()) == sorted(
        {t for _, t, _ in base})


def test_streaming_exact_dedup_unbounded_variant(spark, tmp_path):
    from oroch_spark.operators import dedup

    src = str(tmp_path / "docs_u")
    df = spark.createDataFrame(
        [(i, f"t {i % 7}") for i in range(50)],
        "doc_id bigint, text string")
    df.coalesce(2).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = dedup.streaming_exact_dedup(stream, content_col="text")
    q = (out.writeStream.format("memory").queryName("sdedup_u")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.table("sdedup_u").count() == 7


def test_conversation_progress_long_key_and_null_ts(spark, tmp_path):
    """The stateful operator must work with a NON-string group column
    (output schema built from the caller's key name + type) and must
    ignore null event times instead of folding the int64-min NaT
    sentinel into first_us."""
    import datetime
    import os

    from pyspark.sql import Row

    schema = "user_id long, ts timestamp, role string"
    src = str(tmp_path / "src")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [Row(user_id=7, ts=t0, role="user"),
            Row(user_id=7, ts=None, role="assistant"),
            Row(user_id=8, ts=t0, role="user")]
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    prog = windowed.conversation_progress(stream, conv_col="user_id")
    q = (prog.writeStream.format("memory")
         .queryName("prog_longkey").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = {r["user_id"]: r
           for r in spark.sql("select * from prog_longkey").collect()}
    assert out[7]["n_turns"] == 2 and out[7]["n_assistant"] == 1
    assert out[7]["first_us"] == out[7]["last_us"]
    assert out[7]["first_us"] > 0  # NOT the int64-min NaT sentinel
    assert out[8]["n_turns"] == 1
