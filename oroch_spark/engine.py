"""Spark encode/decode jobs: the engine proper.

Spark-first architecture (SURVEY.md §3-4): the relational layer is plain
DataFrame ops — salted repartition (shuffle), groupBy-applyInPandas for
the vectorized encode kernel, mapInPandas (no shuffle) for decode, and
DataFrame aggregations for the manifest. No RDDs, no driver-side loops
over rows, no per-row Python. The codec work happens inside Arrow-batched
pandas UDFs calling the numpy kernels.

Scale design (the 10^12-turn story):
- **Skew**: one conversation with millions of turns must not pin one
  task. The partition key is ``xxhash64(conv_id, turn_idx // chunk_rows)
  % n_buckets`` — long conversations split across buckets in
  ``chunk_rows`` runs, short conversations stay whole; every bucket gets
  a bounded, roughly equal share. Decode needs no cross-bucket state.
- **Blocks**: within a bucket, rows are sorted by the stable key
  (conv_id, turn_idx) and cut into ``block_rows`` blocks; each block is
  one self-contained row of the encoded table (per-column blobs + a
  descriptor). This is the scaled-up analogue of the reference's
  256-value groups (`/root/reference/oroch/integer_array.h:44`).
- **Resume**: the blocks table is written ``partitionBy(bucket)`` with
  dynamic partition overwrite, so re-encoding a bucket is idempotent;
  a manifest row per bucket (lineage: snapshot id, bounds, codec
  histogram, bytes in/out, wall) marks completion. A restarted run
  anti-joins planned buckets against the manifest and encodes only the
  remainder (see `checkpoint.py`).
- **No collect()** anywhere in the data path; the only driver-side list
  is the pending-bucket id list (bounded by n_buckets).
"""
from __future__ import annotations

import json
import time
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .kernels import integers as ic
from .kernels import strings as sc

# Column kind tags
K_I32, K_I64, K_F64, K_TS, K_STR = "i32", "i64", "f64", "ts", "str"

BLOCK_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("block_idx", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("key_min", T.StringType()),
    T.StructField("key_max", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("desc", T.StringType()),
    T.StructField("bytes_in", T.LongType()),
    T.StructField("bytes_out", T.LongType()),
    T.StructField("ref_bytes", T.LongType()),
])


def column_kinds(schema: T.StructType) -> list[tuple[str, str]]:
    out = []
    for f in schema.fields:
        if f.name.startswith("_"):
            continue
        dt = f.dataType
        if isinstance(dt, T.IntegerType):
            out.append((f.name, K_I32))
        elif isinstance(dt, T.LongType):
            out.append((f.name, K_I64))
        elif isinstance(dt, T.DoubleType):
            out.append((f.name, K_F64))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            out.append((f.name, K_TS))
        elif isinstance(dt, T.StringType):
            out.append((f.name, K_STR))
        else:
            raise ValueError(f"unsupported column type {f.name}: {dt}")
    return out


def spark_type_of(kind: str) -> T.DataType:
    return {
        K_I32: T.IntegerType(), K_I64: T.LongType(), K_F64: T.DoubleType(),
        K_TS: T.TimestampType(), K_STR: T.StringType(),
    }[kind]


# ---------------------------------------------------------------------------
# Per-block column encode/decode (inside the UDF; pure numpy/pandas)
# ---------------------------------------------------------------------------

def _encode_column(vals: pd.Series, kind: str, text_hint: bool):
    """-> (blob bytes, desc dict, bytes_in, ref_bytes)."""
    n = len(vals)
    if kind == K_STR:
        blob, d = sc.encode_str_block(vals, text_hint=text_hint)
        lengths_total = int(sc.series_to_bytes(vals)[0].sum()) if n else 0
        return blob, {"k": kind, "c": d.codec_name}, lengths_total + 4 * n, d.ref_total
    if kind == K_TS:
        arr = vals.to_numpy()
        if arr.dtype.kind == "M":
            arr = arr.astype("datetime64[us]").view("int64")
        else:  # already integral micros
            arr = arr.astype(np.int64)
        ints, width, delta = arr, 8, True
    elif kind == K_F64:
        ints = vals.to_numpy(dtype=np.float64).view(np.int64)
        width, delta = 8, False
    elif kind == K_I32:
        ints, width, delta = vals.to_numpy(dtype=np.int64), 4, True
    else:
        ints, width, delta = vals.to_numpy(dtype=np.int64), 8, True
    desc = ic.select(ints, width=width, try_delta=delta)
    blob = ic.encode_block(ints, desc=desc, width=width)
    return (blob, {"k": kind, "c": desc.codec_name},
            width * n, desc.ref_total)


def _decode_column(blob: bytes, kind: str, n: int):
    if kind == K_STR:
        return sc.decode_str_block(blob, n)
    width = 4 if kind == K_I32 else 8
    ints = ic.decode_block(blob, n, width=width)
    if kind == K_TS:
        return pd.Series(ints.view("datetime64[us]"))
    if kind == K_F64:
        return pd.Series(ints.view(np.float64))
    if kind == K_I32:
        return pd.Series(ints.astype(np.int32))
    return pd.Series(ints)


def make_encode_fn(kinds: list[tuple[str, str]], key_cols: list[str],
                   block_rows: int, text_cols: frozenset[str]):
    """Build the applyInPandas kernel: sort one bucket by the stable key,
    cut into blocks, encode every column of every block."""

    def encode_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["_bucket"].iloc[0]) if len(pdf) else -1
        pdf = pdf.sort_values(key_cols, kind="mergesort")
        rows = []
        nrows = len(pdf)
        for bi, lo in enumerate(range(0, nrows, block_rows)):
            chunk = pdf.iloc[lo:lo + block_rows]
            n = len(chunk)
            pieces = []
            desc_cols = []
            bytes_in = 0
            ref_bytes = 0
            for name, kind in kinds:
                blob, d, b_in, b_ref = _encode_column(
                    chunk[name], kind, name in text_cols)
                d["o"] = sum(len(p) for p in pieces)
                d["l"] = len(blob)
                d["n"] = name
                pieces.append(blob)
                desc_cols.append(d)
                bytes_in += b_in
                ref_bytes += b_ref
            payload = b"".join(pieces)
            key0 = "|".join(str(chunk[k].iloc[0]) for k in key_cols)
            key1 = "|".join(str(chunk[k].iloc[-1]) for k in key_cols)
            rows.append({
                "bucket": bucket, "block_idx": bi, "n": n,
                "key_min": key0, "key_max": key1,
                "payload": payload,
                "desc": json.dumps({"cols": desc_cols}),
                "bytes_in": bytes_in,
                "bytes_out": len(payload),
                "ref_bytes": ref_bytes,
            })
        return pd.DataFrame(rows, columns=[f.name for f in BLOCK_SCHEMA.fields])

    return encode_bucket


def make_decode_fn(kinds: list[tuple[str, str]]):
    """mapInPandas kernel: each encoded block row expands to its rows.
    No shuffle — blocks decode independently (SURVEY.md §3.2)."""

    def decode_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                desc = json.loads(row["desc"])
                payload = row["payload"]
                n = int(row["n"])
                out = {}
                for d in desc["cols"]:
                    blob = payload[d["o"]:d["o"] + d["l"]]
                    out[d["n"]] = _decode_column(bytes(blob), d["k"], n)
                yield pd.DataFrame(out)

    return decode_blocks


# ---------------------------------------------------------------------------
# Jobs
# ---------------------------------------------------------------------------

def with_bucket(df: DataFrame, conv_col: str, order_col: Optional[str],
                n_buckets: int, chunk_rows: int) -> DataFrame:
    """Salted bucket id: xxhash64(conv_id, turn_idx // chunk) % buckets.
    Defuses long-conversation skew while keeping chunk_rows-sized runs
    contiguous for run-length-friendly codecs (SURVEY.md §7 step 5)."""
    if order_col is not None:
        salt = (F.col(order_col).cast("long") / F.lit(chunk_rows)).cast("long")
        h = F.xxhash64(F.col(conv_col), salt)
    else:
        h = F.xxhash64(F.col(conv_col))
    return df.withColumn("_bucket", F.pmod(h, F.lit(n_buckets)).cast("int"))


def encode_df(df: DataFrame, key_cols: list[str], n_buckets: int = 32,
              block_rows: int = 65536, chunk_rows: int = 8192,
              text_cols: Optional[list[str]] = None,
              bucket_filter: Optional[list[int]] = None) -> DataFrame:
    """Encode a DataFrame into the blocks table. Lazy — returns the
    blocks DataFrame; callers write/aggregate it."""
    kinds = column_kinds(df.schema)
    conv_col = key_cols[0]
    order_col = key_cols[1] if len(key_cols) > 1 else None
    text_cols = frozenset(text_cols or [])
    df = with_bucket(df, conv_col, order_col, n_buckets, chunk_rows)
    if bucket_filter is not None:
        df = df.filter(F.col("_bucket").isin([int(b) for b in bucket_filter]))
    fn = make_encode_fn(kinds, key_cols, block_rows, text_cols)
    return df.groupBy("_bucket").applyInPandas(fn, schema=BLOCK_SCHEMA)


def decode_df(blocks: DataFrame, schema_kinds: list[tuple[str, str]]) -> DataFrame:
    out_schema = T.StructType(
        [T.StructField(n, spark_type_of(k)) for n, k in schema_kinds])
    fn = make_decode_fn(schema_kinds)
    return blocks.mapInPandas(fn, schema=out_schema)


def roundtrip_df(df: DataFrame, key_cols: list[str], **kw) -> DataFrame:
    """encode -> decode in one lazy plan (the flagship correctness path:
    decoded output must be bit-identical to the source under the stable
    key ordering — `tests/unit/integer_codec.cc:8-43` generalized to all
    columns per the north rule)."""
    kinds = column_kinds(df.schema)
    return decode_df(encode_df(df, key_cols, **kw), kinds)


def checksum_df(df: DataFrame) -> int:
    """Order-insensitive whole-table checksum: sum of per-row xxhash64
    over all columns (no global sort — scales to any size)."""
    cols = [F.col(c) for c in sorted(df.columns)]
    s = (df.select(F.xxhash64(*cols).cast("decimal(38,0)").alias("h"))
           .agg(F.sum("h").alias("s")).collect()[0]["s"])
    return int(s) if s is not None else 0


def pruned_lookup(df: DataFrame, key_col: str, value: int,
                  n_buckets: int = 8, block_rows: int = 4096) -> DataFrame:
    """Metadata-pruned point lookup: encode, skip blocks whose
    [key_min, key_max] range cannot contain the key, decode only the
    survivors. The Spark analogue of the reference's pruned ``find``
    (`/root/reference/oroch/integer_array.h:71-136`): answer "not here"
    from block metadata without touching payloads."""
    kinds = column_kinds(df.schema)
    blocks = encode_df(df, [key_col], n_buckets=n_buckets,
                       block_rows=block_rows)
    v = str(int(value)).zfill(20)
    pruned = blocks.filter((F.lpad("key_min", 20, "0") <= v)
                           & (F.lpad("key_max", 20, "0") >= v))
    return decode_df(pruned, kinds).filter(F.col(key_col) == value)


def manifest_rows(blocks: DataFrame, snapshot_id: str, run_id: str) -> DataFrame:
    """Per-bucket lineage rollup (north rule: snapshot-id, partition
    bounds, codec histogram, bytes in/out)."""
    hist = F.map_from_entries(F.collect_list(F.struct("codec", "cnt")))
    per_codec = (blocks
                 .select("bucket",
                         F.explode(_codec_entries(F.col("desc"))).alias("codec"))
                 .groupBy("bucket", "codec").agg(F.count("*").alias("cnt"))
                 .groupBy("bucket").agg(hist.alias("codec_hist")))
    agg = (blocks.groupBy("bucket").agg(
        F.count("*").alias("n_blocks"),
        F.sum("n").alias("n_rows"),
        F.sum("bytes_in").alias("bytes_in"),
        F.sum("bytes_out").alias("bytes_out"),
        F.sum("ref_bytes").alias("ref_bytes"),
        F.min("key_min").alias("key_min"),
        F.max("key_max").alias("key_max"),
    ))
    return (agg.join(per_codec, "bucket", "left")
               .withColumn("snapshot_id", F.lit(snapshot_id))
               .withColumn("run_id", F.lit(run_id))
               .withColumn("status", F.lit("done"))
               .withColumn("completed_at", F.current_timestamp()))


def _codec_entries(desc_col):
    """Extract the per-column codec names from the desc JSON."""
    return F.from_json(
        desc_col,
        T.StructType([T.StructField("cols", T.ArrayType(T.StructType([
            T.StructField("c", T.StringType())])))]),
    )["cols"]["c"]
