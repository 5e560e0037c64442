"""BinaryType (opaque media payload) column codec: lossless round-trip
in raw and dictionary modes, nullable, and through the full Spark
encode->decode path."""
import numpy as np
import pyarrow as pa

from pyspark.sql import functions as F

from oroch_spark import engine
from oroch_spark.operators import multimodal


def _rt(pays, nullable_expected=False):
    arr = pa.array(pays, type=pa.binary())
    blob, d, b_in, b_ref = engine._encode_column(arr, engine.K_BIN, False)
    out = engine._decode_column(blob, engine.K_BIN, len(pays),
                                pa.binary(), nullable=bool(d.get("z")))
    return out.to_pylist(), d, len(blob), b_ref


def test_raw_mode_roundtrip_within_budget():
    rng = np.random.default_rng(3)
    pays = [bytes(rng.integers(0, 256, int(rng.integers(0, 200)),
                               dtype=np.uint8)) for _ in range(100)]
    pays[7] = b""
    got, d, nbytes, ref = _rt(pays)
    assert got == pays
    assert d["c"] == "binraw"
    assert nbytes <= ref


def test_dict_mode_compresses_duplicate_payloads():
    pays = [b"thumbnail-A" * 50, b"thumbnail-B" * 50, b""] * 100
    got, d, nbytes, ref = _rt(pays)
    assert got == pays
    assert d["c"] == "bindict"
    assert nbytes < ref // 50  # dedup: two uniques out of 300 rows


def test_nullable_binary_roundtrip():
    pays = [b"abc", None, b"", b"xyz"]
    got, d, _, _ = _rt(pays)
    assert got == pays


def test_media_table_roundtrip_through_spark(spark):
    media = multimodal.synthetic_media(spark, n=60, seed=11)
    rt = engine.roundtrip_df(media, ["media_id"], n_buckets=4)
    src = {r.media_id: r for r in media.collect()}
    for r in rt.collect():
        s = src[r.media_id]
        assert bytes(r.payload) == bytes(s.payload)
        assert (r.kind, r.mime, r.width, r.height) == \
            (s.kind, s.mime, s.width, s.height)
    assert rt.count() == 60
