"""Incremental (streaming) encode: Structured Streaming front-end.

The reference has no streaming surface (SURVEY.md §2.6); this is the
Spark-idiomatic extension: new transcript rows arrive on a stream, each
micro-batch is encoded with the same kernels and appended to the blocks
table as a new snapshot increment. Because blocks are self-contained
(bucket, block_idx scoped by batch), readers never need cross-batch
state; compaction (re-blocking small increments) is a batch job reusing
``engine.encode_df``.

Append-only contract (the manifest contract for the reference's
``integer_array::insert`` analogue, `/root/reference/oroch/
integer_array.h:216-245`): increments land as NEW snapshot blocks —
there is no merge-on-read or upsert. Rows re-sent for an existing
(conv_id, turn_idx) appear in BOTH the base snapshot and the increment
until ``engine.recompact`` rewrites them; readers that need
latest-wins semantics must dedup on the stable key (max batch_id wins)
or read post-compaction snapshots. This is the standard
immutable-table trade: the reference pays a ripple re-encode per
insert, this engine pays a periodic compaction batch instead.
"""
from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .. import engine


def encode_stream(stream_df: DataFrame, out_dir: str,
                  key_cols: list[str], n_buckets: int = 32,
                  block_rows: int = 65536, chunk_rows: int = 8192,
                  text_cols: Optional[list[str]] = None,
                  checkpoint_dir: Optional[str] = None,
                  trigger_once: bool = False):
    """Start a streaming query that encodes every micro-batch and
    lands its blocks (tagged with the batch id) under
    ``out_dir/blocks_stream/b<batch_id>/``. Exactly-once via the
    streaming checkpoint + an IDEMPOTENT per-batch write:
    ``foreachBatch`` is at-least-once, so a replayed micro-batch
    (driver crash between the parquet write and the checkpoint
    commit) overwrites its own batch directory instead of appending a
    duplicate set of blocks. For manifest-committed exactly-once with
    concurrent DML, prefer ``writeStream.format("oroch")``
    (`sources/datasource.py`)."""
    blocks_path = os.path.join(out_dir, "blocks_stream")
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_stream_ckpt")

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        blocks = engine.encode_df(
            batch_df, key_cols, n_buckets=n_buckets,
            block_rows=block_rows, chunk_rows=chunk_rows,
            text_cols=text_cols)
        (blocks.withColumn("batch_id", F.lit(batch_id))
               .write.mode("overwrite")
               .parquet(os.path.join(blocks_path, f"b{batch_id}")))

    writer = (stream_df.writeStream
              .foreachBatch(handle_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_blocks(spark, out_dir: str) -> DataFrame:
    # per-batch subdirs (b<id>/): recursive lookup flattens them while
    # keeping the layout idempotent-overwritable per batch
    return (spark.read.option("recursiveFileLookup", "true")
            .parquet(os.path.join(out_dir, "blocks_stream")))


def read_latest(spark, out_dir: Optional[str],
                schema_kinds: list[tuple[str, str]],
                key_cols: list[str],
                base_blocks: Optional[DataFrame] = None,
                tombstone_col: Optional[str] = None,
                inc_blocks: Optional[DataFrame] = None) -> DataFrame:
    """Merge-on-read / latest-wins reader: the append-only contract
    above, made executable. Decodes the streaming increments (each row
    tagged with its micro-batch id via decode passthrough) plus an
    optional base snapshot (rank -1, i.e. older than every increment)
    and keeps exactly one row per stable key — the one from the
    highest batch_id. Within a single batch the key is unique by the
    encode contract (a micro-batch is one consistent snapshot of its
    keys), so the ranking is total.

    ``tombstone_col`` names an optional boolean column (encoded like
    any other bool) marking the row as a DELETE of its key — the
    equality-delete analogue of Iceberg merge-on-read: a deleted key's
    newest row wins the ranking and is then dropped, so the key
    disappears from the view even though the base row is still on
    disk (until recompaction rewrites it). The base snapshot may
    predate the tombstone column; missing => not deleted.

    Scale shape: one hash shuffle on the stable key (the same key the
    blocks are bucketed by) + a per-key top-1 — the standard
    merge-on-read cost, paid only until ``engine.recompact`` folds the
    increments into right-sized base blocks.

    ``inc_blocks`` overrides where the increments come from (any blocks
    DataFrame carrying a ``batch_id`` column — e.g. the committed view
    of a ``writeStream.format("oroch")`` sink from
    ``sources.datasource.stream_sink_blocks``); by default they are
    read from ``out_dir/blocks_stream`` (the ``encode_stream``
    layout)."""
    from pyspark.sql import Window

    if inc_blocks is None:
        inc_blocks = read_stream_blocks(spark, out_dir)
    inc = engine.decode_df(inc_blocks, schema_kinds,
                           passthrough=["batch_id"])
    rows = inc
    if base_blocks is not None:
        # decode the base with the FULL schema: blocks written before
        # the tombstone column was born null-fill it per block (decode
        # schema evolution), and the coalesce below reads null as
        # "not deleted". Probing one block's desc to decide for the
        # whole base would misread a heterogeneous base (pre- and
        # post-evolution blocks mixed): whichever block the probe
        # happened to hit would decide for all, False-filling genuine
        # tombstones in the newer blocks.
        base = engine.decode_df(base_blocks, schema_kinds) \
            .withColumn("batch_id", F.lit(-1).cast("long"))
        rows = base.unionByName(inc)
    w = Window.partitionBy(*key_cols).orderBy(F.col("batch_id").desc())
    out = (rows.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1)
               .drop("_rn", "batch_id"))
    if tombstone_col is not None:
        out = (out.filter(~F.coalesce(F.col(tombstone_col), F.lit(False)))
                  .drop(tombstone_col))
    return out
