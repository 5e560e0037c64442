"""String codec tests (FIXTURES.md §F3; codecs per SURVEY.md §2.7 — the
reference is integers-only, so these fixtures have no Oroch analogue)."""
import numpy as np
import pandas as pd
import pytest

from oroch_spark.kernels import fsst
from oroch_spark.kernels import strings as sc


def roundtrip(values, **kw):
    values = np.asarray(values, dtype=object)
    blob, desc = sc.encode_str_block(values, **kw)
    back = sc.decode_str_block(blob, len(values)).to_numpy()
    assert np.array_equal(values, back), (desc.codec_name,
                                          values[:5], back[:5])
    assert desc.data_bytes == len(blob)
    assert len(blob) <= desc.ref_total
    return blob, desc


def make_token_soup(rng, n, vocab_size=512):
    vocab = np.array([f"tok{i:03d}" for i in range(vocab_size)], dtype=object)
    out = []
    for _ in range(n):
        k = int(rng.integers(1, 30))
        out.append(" ".join(vocab[rng.integers(0, vocab_size, k)]))
    return np.array(out, dtype=object)


class TestSelection:
    def test_low_card_runs_pick_rle(self):
        vals = np.repeat(np.array(["alpha", "beta", "gamma", "delta"],
                                  dtype=object), 2500)
        blob, desc = roundtrip(vals)
        assert desc.codec == sc.RLE_STR
        assert len(blob) < 200

    def test_low_card_shuffled_pick_dict(self):
        rng = np.random.default_rng(1)
        base = np.array(["user", "assistant", "system", "tool"], dtype=object)
        vals = base[rng.integers(0, 4, 10_000)]
        blob, desc = roundtrip(vals)
        assert desc.codec == sc.DICT_STR
        assert len(blob) < 10_000  # ~2 bits/value + dict
        assert len(blob) < 3000

    def test_all_equal(self):
        vals = np.array(["same"] * 1000, dtype=object)
        blob, desc = roundtrip(vals)
        assert desc.codec in (sc.RLE_STR, sc.DICT_STR)
        assert len(blob) < 40

    def test_word_text_picks_wsdict(self):
        # space-separated token soup: the word-dictionary codec captures
        # cross-string redundancy and must win over FSST
        rng = np.random.default_rng(2)
        vals = make_token_soup(rng, 2000)
        blob, desc = roundtrip(vals)
        assert desc.codec == sc.WSDICT_STR
        raw = sum(len(v.encode()) for v in vals)
        assert len(blob) < raw * 0.35  # strong compression

    def test_spaceless_patterned_text_picks_fsst(self):
        # no spaces -> wsdict degenerates to whole-string dict; distinct
        # strings built from repeated in-string substrings are FSST's case
        rng = np.random.default_rng(3)
        frags = ["abcdefg", "hijklmn", "opqrstu", "vwxyzab"]
        vals = ["".join(frags[j] for j in rng.integers(0, 4, 40)) + str(i)
                for i in range(600)]
        blob, desc = roundtrip(vals)
        assert desc.codec == sc.FSST_STR
        raw = sum(len(v.encode()) for v in vals)
        assert len(blob) < raw * 0.7

    def test_empty_and_edge(self):
        roundtrip([])
        roundtrip([""])
        roundtrip(["", "a", "x" * 8000, "\x00ab", "", ""])
        roundtrip(["héllo", "→", "🙂🙂", "héllo", "plain"])

    def test_conv_id_shape(self):
        ids = np.repeat(
            np.array([f"conv-{i:08d}" for i in range(200)], dtype=object),
            np.arange(1, 201) % 37 + 1)
        blob, desc = roundtrip(ids)
        assert len(blob) < sum(len(s) for s in ids) // 4


class TestFsstKernel:
    def test_roundtrip_with_boundaries(self):
        rng = np.random.default_rng(3)
        vals = make_token_soup(rng, 300)
        lengths, data = sc.series_to_bytes(pd.Series(vals))
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        table = fsst.build_table(data, starts)
        assert 0 < len(table) <= 255
        enc, enc_lens = fsst.encode(data, starts, table)
        assert int(enc_lens.sum()) == len(enc)
        dec, dec_lens = fsst.decode_split(enc, enc_lens, table)
        assert np.array_equal(dec, data)
        assert np.array_equal(dec_lens, lengths)

    def test_no_cross_string_matches(self):
        # "abcd" appears only split across two strings -> must not match
        vals = np.array(["xxab", "cdyy"] * 50 + ["abcd"] * 50, dtype=object)
        roundtrip(vals, text_hint=True)

    def test_escape_bytes(self):
        # byte values around the escape marker in literals
        vals = np.array(["\xff\xff", "a\xffb", "\xff" * 5, "plain"] * 30,
                        dtype=object)
        roundtrip(vals, text_hint=True)

    def test_determinism(self):
        rng = np.random.default_rng(4)
        vals = make_token_soup(rng, 500)
        b1, _ = sc.encode_str_block(vals, text_hint=True)
        b2, _ = sc.encode_str_block(vals.copy(), text_hint=True)
        assert b1 == b2

    @pytest.mark.parametrize("seed", [10, 11, 12])
    def test_randomized_bytes(self, seed):
        rng = np.random.default_rng(seed)
        vals = np.array(
            ["".join(chr(c) for c in rng.integers(1, 256, rng.integers(0, 40)))
             for _ in range(200)], dtype=object)
        roundtrip(vals, text_hint=True)


class TestEqIndices:
    """str_block_eq_indices: equality probe straight off the codec —
    must agree with decode-then-compare for every codec tag."""

    def _check(self, vals, probe, expect_tag=None):
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(list(vals))
        blob, d = sc.encode_str_block(arr)
        if expect_tag is not None:
            assert d.codec == expect_tag
        got = sc.str_block_eq_indices(blob, len(arr), probe)
        exp = np.flatnonzero(
            pc.equal(sc.decode_str_block_arrow(blob, len(arr)),
                     pa.scalar(probe, type=pa.large_string()))
            .to_numpy(zero_copy_only=False))
        assert np.array_equal(got, exp)

    def test_dict_block(self):
        vals = ["a", "b", "a", "c"] * 100
        self._check(vals, "a", sc.DICT_STR)
        self._check(vals, "missing", sc.DICT_STR)

    def test_rle_block(self):
        vals = ["x"] * 300 + ["y"] * 100 + ["x"] * 41
        self._check(vals, "x", sc.RLE_STR)
        self._check(vals, "y", sc.RLE_STR)
        self._check(vals, "z", sc.RLE_STR)

    def test_plain_block(self):
        vals = [f"u{i}" for i in range(64)] + ["u7"]
        self._check(vals, "u7")
        self._check(vals, "nope")

    def test_wsdict_block(self):
        import pyarrow as pa
        rng = np.random.default_rng(3)
        words = [f"tok{i}" for i in range(40)]
        vals = [" ".join(rng.choice(words, 12)) for _ in range(300)]
        vals += [vals[5]]  # a guaranteed duplicate to find
        blob, d = sc.encode_str_block(pa.array(vals), text_hint=True)
        got = sc.str_block_eq_indices(blob, len(vals), vals[5])
        assert 5 in got.tolist() and len(vals) - 1 in got.tolist()

    def test_in_list_probe(self):
        import pyarrow as pa
        import pyarrow.compute as pc

        for vals, tags in [ (["a","b","a","c"]*100, sc.DICT_STR),
                            (["x"]*300+["y"]*100+["x"]*41, sc.RLE_STR),
                            ([f"u{i}" for i in range(64)], None) ]:
            arr = pa.array(list(vals))
            blob, d = sc.encode_str_block(arr)
            if tags is not None:
                assert d.codec == tags
            probe = [vals[0], vals[-1], "zz-missing"]
            got = sc.str_block_eq_indices(blob, len(arr), probe)
            exp = [i for i, v in enumerate(vals) if v in set(probe)]
            assert got.tolist() == sorted(exp) or \
                sorted(got.tolist()) == sorted(exp)
