"""Type-coverage tests: the engine's analogue of the reference's uniform
integer_traits width handling (`/root/reference/oroch/integer_traits.h:
31-59`) extended to Spark's scalar types plus float-vector columns.

Everything is exercised at the column-codec level (no Spark session —
fast), with nullable variants; the Spark-level proof is the
rt_alltypes / rt_embeddings oracle queries.
"""
import datetime
import decimal

import numpy as np
import pyarrow as pa
import pytest

from oroch_spark import engine
from oroch_spark.kernels import integers as ic


def _rt(arr, kind, arrow_type):
    blob, d, b_in, b_ref = engine._encode_column(arr, kind, False)
    out = engine._decode_column(blob, kind, len(arr), arrow_type,
                                nullable=bool(d.get("z")))
    return out, d, len(blob), b_ref


@pytest.mark.parametrize("width", [1, 2, 4, 8])
def test_normal_codec_width_payloads(width):
    lo = -(1 << (8 * width - 1))
    hi = (1 << (8 * width - 1)) - 1
    vals = np.array([lo, hi, 0, -1, 1], dtype=np.int64)
    # high-entropy in the width's domain -> normal; payload width bytes/val
    rng = np.random.default_rng(3)
    vals = np.concatenate([vals, rng.integers(lo, hi, 64)])
    desc = ic.select(vals, width=width)
    blob = ic.encode_block(vals, desc=desc, width=width)
    out = ic.decode_block(blob, len(vals), width=width)
    assert (out == vals).all()
    if desc.codec == ic.NORMAL:
        assert desc.ref_total == 1 + width * len(vals)


@pytest.mark.parametrize("width", [1, 2, 4])
def test_delta_wraps_in_narrow_domain(width):
    lo = -(1 << (8 * width - 1))
    hi = (1 << (8 * width - 1)) - 1
    # max-magnitude alternation: deltas overflow the narrow domain and
    # must wrap losslessly
    vals = np.array([lo, hi, lo, hi, lo, 0, hi], dtype=np.int64)
    desc = ic.select(vals, width=width, try_delta=True)
    blob = ic.encode_block(vals, desc=desc, width=width)
    assert (ic.decode_block(blob, len(vals), width=width) == vals).all()


def test_bool_roundtrip_and_size():
    vals = [True, False, True, None] * 64
    arr = pa.array(vals, type=pa.bool_())
    out, d, nbytes, _ = _rt(arr, engine.K_BOOL, pa.bool_())
    assert out.to_pylist() == vals
    # validity bitmap (32B) + header + ~1 bit/value packed
    assert nbytes < 80


@pytest.mark.parametrize("kind,t,vals", [
    (engine.K_I8, pa.int8(), [1, 2, -3, 127, -128, None]),
    (engine.K_I16, pa.int16(), [100, -200, 32767, -32768, 5, None]),
])
def test_narrow_int_roundtrip(kind, t, vals):
    arr = pa.array(vals, type=t)
    out, d, _, _ = _rt(arr, kind, t)
    assert out.to_pylist() == vals


def test_date_roundtrip_delta_wins_on_sorted_dates():
    base = datetime.date(2024, 1, 1)
    vals = [base + datetime.timedelta(days=i) for i in range(512)]
    arr = pa.array(vals, type=pa.date32())
    out, d, nbytes, ref = _rt(arr, engine.K_DATE, pa.date32())
    assert out.to_pylist() == vals
    assert d["c"].startswith("delta") or d["c"] in ("varint", "bitfor")
    assert nbytes <= ref  # within the reference budget


def test_decimal_roundtrip_extremes():
    vals = [decimal.Decimal("123.45"), decimal.Decimal("-0.01"), None,
            decimal.Decimal("9999999999999999.99"),   # p=18 extreme
            decimal.Decimal("-9999999999999999.99"),
            decimal.Decimal("0.00")]
    arr = pa.array(vals, type=pa.decimal128(18, 2))
    out, d, _, _ = _rt(arr, "dec(18,2)", pa.decimal128(18, 2))
    assert out.to_pylist() == vals


def test_decimal_precision_over_18_rejected():
    import pyspark.sql.types as T
    schema = T.StructType([T.StructField("x", T.DecimalType(28, 2))])
    with pytest.raises(ValueError, match="precision 28"):
        engine.column_kinds(schema)


def test_float32_negative_zero_and_specials():
    f = np.array([1.5, -0.0, np.inf, -np.inf, np.nan, 1e-38],
                 dtype=np.float32)
    arr = pa.array(f, type=pa.float32())
    out, d, _, _ = _rt(arr, engine.K_F32, pa.float32())
    got = out.to_numpy(zero_copy_only=False).view(np.int32)
    assert (got == f.view(np.int32)).all()


def test_float32_decimal_scaling_wins_on_prices():
    rng = np.random.default_rng(11)
    f = np.round(rng.uniform(0, 500, 1024), 2).astype(np.float32)
    # float32 of round(x,2) is NOT exactly x.yz — the scaling check must
    # verify through the float32 round-trip, not the decimal intent
    arr = pa.array(f, type=pa.float32())
    out, d, nbytes, ref = _rt(arr, engine.K_F32, pa.float32())
    assert (out.to_numpy(zero_copy_only=False).view(np.int32)
            == f.view(np.int32)).all()
    assert nbytes <= ref


def test_float_array_bitwise_roundtrip_with_nulls_and_ragged():
    rng = np.random.default_rng(2)
    lists = [rng.standard_normal(rng.integers(0, 12)).astype(
        np.float32).tolist() for _ in range(200)]
    lists[5] = None
    lists[6] = []
    arr = pa.array(lists, type=pa.list_(pa.float32()))
    out, d, _, _ = _rt(arr, "arr(f32)", pa.list_(pa.float32()))
    got = out.to_pylist()
    for g, e in zip(got, lists):
        if e is None:
            assert g is None
        else:
            assert np.array_equal(
                np.asarray(g, np.float32).view(np.int32),
                np.asarray(e, np.float32).view(np.int32))


def test_float_array_plane_mode_large_magnitude():
    """Regression: in plane mode (compressible MSB plane), any element
    with |v| >= 2.0 rotates its MSB byte to >= 0x80; decode_block's
    int8-interpreted return then sign-extended through the inverse
    rotation and flipped the decoded sign (2.5 came back -2.5). Unit-
    norm embeddings never hit it — values must escape (-2, 2)."""
    lists = [[float(i) + 0.25, -(float(i) + 0.5), float(i) * 100.0]
             for i in range(256)]
    arr = pa.array(lists, type=pa.list_(pa.float32()))
    out, d, _, _ = _rt(arr, "arr(f32)", pa.list_(pa.float32()))
    assert d["pc"] != "raw"  # must exercise plane mode
    for g, e in zip(out.to_pylist(), lists):
        assert np.array_equal(
            np.asarray(g, np.float32).view(np.int32),
            np.asarray(e, np.float32).view(np.int32))


def test_float64_array_roundtrip():
    rng = np.random.default_rng(4)
    lists = [rng.standard_normal(16).tolist() for _ in range(64)]
    arr = pa.array(lists, type=pa.list_(pa.float64()))
    out, d, _, _ = _rt(arr, "arr(f64)", pa.list_(pa.float64()))
    for g, e in zip(out.to_pylist(), lists):
        assert np.array_equal(np.asarray(g).view(np.int64),
                              np.asarray(e).view(np.int64))


@pytest.mark.parametrize("arr,kind,t", [
    (pa.array([], type=pa.float32()), engine.K_F32, pa.float32()),
    (pa.array([], type=pa.bool_()), engine.K_BOOL, pa.bool_()),
    (pa.array([], type=pa.int8()), engine.K_I8, pa.int8()),
    (pa.array([], type=pa.date32()), engine.K_DATE, pa.date32()),
    (pa.array([], type=pa.decimal128(12, 2)), "dec(12,2)",
     pa.decimal128(12, 2)),
    (pa.array([], type=pa.list_(pa.float32())), "arr(f32)",
     pa.list_(pa.float32())),
    (pa.array([], type=pa.binary()), engine.K_BIN, pa.binary()),
])
def test_zero_row_blocks_roundtrip(arr, kind, t):
    blob, d, _, ref = engine._encode_column(arr, kind, False)
    out = engine._decode_column(blob, kind, 0, t)
    assert len(out) == 0
    assert len(blob) <= max(ref, 4)  # headers only


def test_embedding_compression_within_budget_and_gains():
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    arr = t.column("embedding").combine_chunks()
    blob, d, b_in, b_ref = engine._encode_column(arr, "arr(f32)", False)
    assert len(blob) <= b_ref
    # sign-rotated MSB plane compresses ~2x on unit-scale embeddings
    n_elems = len(arr.values)
    assert len(blob) < 4 * n_elems * 0.95
