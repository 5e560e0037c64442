"""Regression tests for the round-1 advice findings:

- -0.0 must round-trip bitwise through the float64 column codec (the
  decimal-scaling path must reject it and fall back to raw bits);
- sub-microsecond timestamps are a clear, named error — never silently
  truncated;
- the packed bitstream wire format is little-endian by contract
  (pinned byte values, not just round-trip).
"""
import numpy as np
import pyarrow as pa
import pytest

from oroch_spark import engine
from oroch_spark.kernels import bits


def _roundtrip_f64(vals):
    arr = pa.array(np.array(vals, dtype=np.float64), type=pa.float64())
    blob, desc, _, _ = engine._encode_column(arr, engine.K_F64, False)
    out = engine._decode_column(blob, engine.K_F64, len(vals),
                                pa.float64())
    return out.to_numpy(zero_copy_only=False), desc


def test_negative_zero_roundtrips_bitwise():
    vals = [1.25, 2.5, -0.0, 3.75]
    out, desc = _roundtrip_f64(vals)
    assert out.view(np.int64).tolist() == \
        np.array(vals, dtype=np.float64).view(np.int64).tolist()
    # the sign of -0.0 survives (signbit distinguishes the zeros)
    assert np.signbit(out[2])
    # and the encoder chose the raw-bits path, not decimal scaling
    assert not desc["c"].startswith("dec")


def test_decimal_scaling_still_wins_without_negative_zero():
    vals = [1.25, 2.5, 0.0, 3.75]
    out, desc = _roundtrip_f64(vals)
    assert out.tolist() == vals
    assert desc["c"].startswith("dec")


def test_scaled_candidate_compared_against_actual_raw_blob():
    # price-like values: scaled ints must beat the ACTUAL raw encoding,
    # and the produced blob must never exceed the raw-bits blob
    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 1000, 256), 2)
    arr = pa.array(vals, type=pa.float64())
    blob, desc, _, _ = engine._encode_column(arr, engine.K_F64, False)
    raw_bits = vals.view(np.int64)
    from oroch_spark.kernels import integers as ic
    raw_blob = bytes([0]) + ic.encode_block(
        raw_bits, desc=ic.select(raw_bits, width=8), width=8)
    assert len(blob) <= len(raw_blob)


def test_sub_microsecond_timestamp_is_named_error():
    arr = pa.array([1_000_000_001], type=pa.timestamp("ns"))
    with pytest.raises(ValueError, match="sub-microsecond.*date_trunc"):
        engine._encode_column(arr, engine.K_TS, False, name="ts")


def test_whole_microsecond_ns_timestamps_encode():
    arr = pa.array([1_000_000_000, 2_000_000_000],
                   type=pa.timestamp("ns"))
    blob, d, _, _ = engine._encode_column(arr, engine.K_TS, False,
                                          name="ts")
    out = engine._decode_column(blob, engine.K_TS, 2, pa.timestamp("us"))
    assert out.cast(pa.int64()).to_pylist() == [1_000_000, 2_000_000]


def test_bitstream_wire_bytes_are_little_endian():
    # 5 = bits [1,0,1], 3 = bits [1,1,0] -> stream 101110 (low bit
    # first) -> single byte 0b00011101 = 29. Pinned so the on-disk
    # format is provably host-endianness-independent.
    out = bits.pack_bits(np.array([5, 3], dtype=np.uint64), 3)
    assert out == bytes([29])
    back = bits.unpack_bits(out, 2, 3)
    assert back.tolist() == [5, 3]
