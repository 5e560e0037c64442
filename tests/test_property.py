"""Property-based round-trip tests (hypothesis) for the kernel layer.

The reference's randomized round-trip test (`tests/unit/integer_group.cc:8-22`)
uses unseeded random(); these are its deterministic, adversarial upgrade:
hypothesis shrinks failures and covers boundary structure (INT64 extremes,
empty/constant blocks, unicode, whitespace shapes) far beyond uniform
sampling. No Spark — pure numpy/pyarrow, runs in seconds.
"""
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from oroch_spark.kernels import integers as ic
from oroch_spark.kernels import strings as sc

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
I32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(I64, max_size=300), st.booleans())
def test_int64_roundtrip_any_values(vals, try_delta):
    a = np.array(vals, dtype=np.int64)
    desc = ic.select(a, width=8, try_delta=try_delta)
    blob = ic.encode_block(a, width=8, try_delta=try_delta)
    back = ic.decode_block(blob, len(a), width=8)
    np.testing.assert_array_equal(a, back)
    # actual payload never exceeds the reference-model size
    assert len(blob) <= desc.ref_total


@settings(max_examples=100, deadline=None)
@given(st.lists(I32, max_size=300))
def test_int32_roundtrip_any_values(vals):
    a = np.array(vals, dtype=np.int64)
    blob = ic.encode_block(a, width=4, try_delta=True)
    back = ic.decode_block(blob, len(a), width=4)
    np.testing.assert_array_equal(a, back)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=120), st.booleans())
def test_string_roundtrip_any_text(vals, text_hint):
    arr = pa.array(vals, type=pa.large_string())
    blob, desc = sc.encode_str_block(arr, text_hint=text_hint)
    back = sc.decode_str_block_arrow(blob, len(vals))
    assert back.cast(pa.large_string()).equals(arr)
    assert len(blob) <= desc.ref_total or desc.codec == sc.PLAIN_STR


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from(
    ["", " ", "  ", "a b", "tool_search", "x" * 300,
     "héllo → 🙂", "\x00\x01", "word " * 40]), min_size=1, max_size=200))
def test_string_roundtrip_structured(vals):
    arr = pa.array(vals, type=pa.large_string())
    blob, _ = sc.encode_str_block(arr, text_hint=True)
    back = sc.decode_str_block_arrow(blob, len(vals))
    assert back.cast(pa.large_string()).equals(arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                max_size=200))
def test_varint_roundtrip(vals):
    u = np.array(vals, dtype=np.uint64)
    buf = ic.varint_encode(u)
    back, consumed = ic.varint_decode(buf, len(u))
    assert consumed == len(buf)
    np.testing.assert_array_equal(u, back)


_STR_BLOCKS = st.lists(
    st.text(min_size=0, max_size=24), min_size=1, max_size=200)


@settings(max_examples=150, deadline=None)
@given(_STR_BLOCKS, st.booleans())
def test_value_counts_matches_decode(vals, text_hint):
    """str_block_value_counts must agree with decode-then-count for
    every codec the selector may pick (dict/RLE shortcuts included)."""
    import collections

    blob, _ = sc.encode_str_block(pa.array(vals), text_hint=text_hint)
    got_v, got_c = sc.str_block_value_counts(blob, len(vals))
    got = dict(zip(got_v.to_pylist(), got_c.tolist()))
    assert got == dict(collections.Counter(vals))


@settings(max_examples=150, deadline=None)
@given(_STR_BLOCKS, st.booleans(), st.data())
def test_eq_indices_matches_decode(vals, text_hint, data):
    """str_block_eq_indices must agree with decode-then-compare for a
    probe drawn from the block (guaranteed hits) and a probe that is
    not in it (guaranteed miss)."""
    blob, _ = sc.encode_str_block(pa.array(vals), text_hint=text_hint)
    present = data.draw(st.sampled_from(vals))
    for probe in (present, "\x00definitely-not-present\x00"):
        got = sc.str_block_eq_indices(blob, len(vals), probe)
        exp = [i for i, v in enumerate(vals) if v == probe]
        assert got.tolist() == exp


@settings(max_examples=100, deadline=None)
@given(st.lists(I64, max_size=400), st.integers(0, 10))
def test_hll_merge_associative_and_order_invariant(vals, cut):
    """HLL of a concatenation == register-max of the parts' HLLs, and
    value order never changes the registers (set semantics)."""
    from oroch_spark import engine

    a = pa.array(vals, type=pa.int64())
    whole = np.frombuffer(engine._hll_build(a, engine.K_I64),
                          dtype=np.uint8)
    k = min(cut, len(vals))
    left = np.frombuffer(
        engine._hll_build(pa.array(vals[:k], type=pa.int64()),
                          engine.K_I64), dtype=np.uint8)
    right = np.frombuffer(
        engine._hll_build(pa.array(vals[k:], type=pa.int64()),
                          engine.K_I64), dtype=np.uint8)
    np.testing.assert_array_equal(whole, np.maximum(left, right))
    shuffled = pa.array(sorted(vals), type=pa.int64())
    np.testing.assert_array_equal(
        whole, np.frombuffer(engine._hll_build(shuffled, engine.K_I64),
                             dtype=np.uint8))


@settings(max_examples=100, deadline=None)
@given(st.lists(I64, min_size=1, max_size=400))
def test_qsketch_points_are_exact_order_stats(vals):
    from oroch_spark import engine

    a = pa.array(vals, type=pa.int64())
    blob = np.frombuffer(engine._qsketch_build(a), dtype="<i8")
    nn, pts = int(blob[0]), blob[1:]
    assert nn == len(vals)
    s = np.sort(np.array(vals, dtype=np.int64))
    idx = np.round(np.linspace(0, nn - 1, len(pts))).astype(np.int64)
    np.testing.assert_array_equal(pts, s[idx])
    assert pts[0] == s[0] and pts[-1] == s[-1]
