"""Checkpointed encode job: per-bucket manifest + resume.

Resume contract (north rule; FIXTURES.md §F4): an interrupted run must
resume per-partition without re-encoding completed work and produce
byte-identical final output.

Mechanics:
- blocks parquet is written ``partitionBy(bucket)`` with dynamic
  partition overwrite -> re-encoding a bucket replaces exactly that
  bucket's directory (idempotent, no duplicates even if a previous
  attempt wrote blocks but died before its manifest row landed);
- the manifest parquet gains one row per completed bucket (append);
  completion is defined by the manifest, not by block files;
- a new run lists planned buckets, anti-joins manifest rows with the
  same source snapshot id, and encodes only the remainder, in
  ``buckets_per_stage`` groups (the checkpoint granularity — each stage
  is one fully-distributed Spark job over its buckets).

The only driver-side state is the pending bucket-id list (bounded by
n_buckets, never by data size).
"""
from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import engine


@dataclass
class EncodeResult:
    blocks_path: str
    manifest_path: str
    snapshot_id: str
    run_id: str
    encoded_buckets: list = field(default_factory=list)
    skipped_buckets: list = field(default_factory=list)
    wall_sec: float = 0.0


def _done_buckets(spark: SparkSession, manifest_path: str,
                  snapshot_id: str) -> set[int]:
    if not os.path.exists(manifest_path):
        return set()
    m = spark.read.parquet(manifest_path)
    rows = (m.filter((F.col("snapshot_id") == snapshot_id)
                     & (F.col("status") == "done"))
             .select("bucket").distinct().collect())
    return {r["bucket"] for r in rows}


def encode_job(spark: SparkSession, df: DataFrame, out_dir: str,
               key_cols: list[str], snapshot_id: str,
               n_buckets: int = 32, block_rows: int = 65536,
               chunk_rows: int = 8192,
               text_cols: Optional[list[str]] = None,
               buckets_per_stage: Optional[int] = None,
               fail_after_stages: Optional[int] = None,
               bloom_cols: Optional[list[str]] = None,
               sketch_cols: Optional[list[str]] = None) -> EncodeResult:
    """Run (or resume) the checkpointed encode of ``df`` into
    ``out_dir/{blocks,manifest}``.

    ``fail_after_stages`` injects a crash after k committed stages —
    used by the resume tests (FIXTURES.md §F4); never set in production.
    """
    t0 = time.time()
    blocks_path = os.path.join(out_dir, "blocks")
    manifest_path = os.path.join(out_dir, "manifest")
    run_id = uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = _done_buckets(spark, manifest_path, snapshot_id)
    pending = [b for b in range(n_buckets) if b not in done]
    res = EncodeResult(blocks_path, manifest_path, snapshot_id, run_id,
                       skipped_buckets=sorted(done))

    stage_size = buckets_per_stage or max(1, len(pending))
    stages = [pending[i:i + stage_size]
              for i in range(0, len(pending), stage_size)]
    for k, stage in enumerate(stages):
        if fail_after_stages is not None and k >= fail_after_stages:
            raise RuntimeError(
                f"injected failure before stage {k} (test hook)")
        blocks = engine.encode_df(
            df, key_cols, n_buckets=n_buckets, block_rows=block_rows,
            chunk_rows=chunk_rows, text_cols=text_cols,
            bucket_filter=stage if len(stage) < n_buckets else None,
            bloom_cols=bloom_cols, sketch_cols=sketch_cols)
        blocks.persist()
        try:
            (blocks.write.partitionBy("bucket").mode("overwrite")
                   .parquet(blocks_path))
            manifest = engine.manifest_rows(blocks, snapshot_id, run_id)
            manifest.write.mode("append").parquet(manifest_path)
        finally:
            blocks.unpersist()
        res.encoded_buckets.extend(stage)
    res.wall_sec = time.time() - t0
    return res


def read_blocks(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "blocks"))


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "manifest"))
