"""String block codecs: plain, dictionary, RLE, FSST — with exact-cost
auto-selection in the style of the reference's integer selector
(`/root/reference/oroch/integer_codec.h:405-420`: strict-less compare in a
fixed candidate order).

The reference library is integers-only (SURVEY.md §1.1); these codecs are
required by the north rule (SURVEY.md §2.7). Every integer sub-sequence a
string codec produces (lengths, dictionary indices, run lengths) is
recursively encoded through the Oroch-style integer selector in
``integers.py`` — exactly the reference's pattern of plugging sequences
into ``integer_codec`` (dictionary indices *are* an Oroch integer
sequence).

Blob layout (self-contained given n, which travels in block-row metadata,
same convention as the integer blobs):
  PLAIN : tag | sized(int-blob lengths)    | utf8 bytes
  DICT  : tag | varint(ndict) | sized(int-blob dict lengths) | dict bytes
              | int-blob indices
  RLE   : tag | varint(nruns) | sized(int-blob run lengths)
              | sized(int-blob run-value lengths) | run-value bytes
  FSST  : tag | symbol table | sized(int-blob encoded lengths) | encoded
where sized(b) = varint(len(b)) + b.

Reference-budget baseline for strings (documented per BASELINE.md): the
reference size of a string block is its PLAIN cost with the length
sequence charged at the Oroch integer-selector model size. The selector
always includes PLAIN, and integer blobs never exceed their model size,
so chosen-actual <= plain-actual <= plain-reference holds by
construction.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from . import fsst
from . import integers as ic

PLAIN_STR = 16
DICT_STR = 17
RLE_STR = 18
FSST_STR = 19

STR_CODEC_NAMES = {
    PLAIN_STR: "plain_str",
    DICT_STR: "dict_str",
    RLE_STR: "rle_str",
    FSST_STR: "fsst_str",
}

# Selection gates (deterministic functions of block stats).
DICT_MAX_RATIO = 0.5       # try dict when ndistinct <= n * ratio
DICT_MAX_ABS = 1 << 16
RLE_MAX_RATIO = 0.5        # try rle when nruns <= n * ratio
FSST_MIN_AVG_LEN = 8.0     # try fsst on text-like blocks
FSST_MIN_BYTES = 1 << 12


@dataclass
class StrDescriptor:
    codec: int
    n: int
    ref_total: int      # plain-at-reference-model cost (budget baseline)
    data_bytes: int     # actual blob size
    detail: str = ""

    @property
    def codec_name(self) -> str:
        return STR_CODEC_NAMES[self.codec]


# ---------------------------------------------------------------------------
# pandas/pyarrow <-> (lengths, concatenated utf8) without per-row Python
# ---------------------------------------------------------------------------

def series_to_bytes(values) -> tuple[np.ndarray, np.ndarray]:
    """-> (lengths int64, data uint8). Nulls are rejected (v0 engine
    contract: the transcript schema is null-free; '' stands for missing)."""
    arr = pa.array(values, type=pa.large_string())
    if arr.null_count:
        raise ValueError("null strings not supported in v0 blocks")
    buf_off, buf_data = arr.buffers()[1], arr.buffers()[2]
    offsets = np.frombuffer(buf_off, dtype=np.int64,
                            count=len(arr) + 1, offset=8 * arr.offset)
    data = np.frombuffer(buf_data, dtype=np.uint8)[offsets[0]:offsets[-1]]
    lengths = np.diff(offsets)
    return lengths.astype(np.int64), np.ascontiguousarray(data)


def bytes_to_series(lengths: np.ndarray, data: np.ndarray) -> pd.Series:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    arr = pa.LargeStringArray.from_buffers(
        len(lengths),
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(np.ascontiguousarray(data).tobytes()),
        None, 0,
    )
    return arr.to_pandas()


def _sized(blob: bytes) -> bytes:
    return ic.varint_encode_scalar(len(blob)) + blob


def _read_sized(buf: bytes, pos: int) -> tuple[bytes, int]:
    size, pos = ic.varint_decode_scalar(buf, pos)
    return buf[pos:pos + size], pos + size


def _int_blob(vals: np.ndarray, width: int = 4) -> bytes:
    return ic.encode_block(vals.astype(np.int64), width=width, try_delta=True)


# ---------------------------------------------------------------------------
# Candidate encoders
# ---------------------------------------------------------------------------

def _encode_plain(lengths, data) -> bytes:
    return bytes([PLAIN_STR]) + _sized(_int_blob(lengths)) + data.tobytes()


def _encode_dict(codes: np.ndarray, uniques: np.ndarray) -> bytes:
    dl, dd = series_to_bytes(pd.Series(uniques, dtype=object))
    return (bytes([DICT_STR])
            + ic.varint_encode_scalar(len(uniques))
            + _sized(_int_blob(dl))
            + dd.tobytes()
            + _int_blob(codes))


def _encode_rle(codes: np.ndarray, values) -> bytes:
    """values: object array of per-run strings; codes only used to find
    runs (callers pass factorized codes)."""
    boundaries = np.flatnonzero(np.diff(codes) != 0) + 1
    starts = np.concatenate([[0], boundaries])
    run_len = np.diff(np.concatenate([starts, [len(codes)]]))
    run_vals = values[starts]
    rl, rd = series_to_bytes(pd.Series(run_vals, dtype=object))
    return (bytes([RLE_STR])
            + ic.varint_encode_scalar(len(starts))
            + _sized(_int_blob(run_len))
            + _sized(_int_blob(rl))
            + rd.tobytes())


def _encode_fsst(lengths, data) -> Optional[bytes]:
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    table = fsst.build_table(data, starts)
    if not table:
        return None
    enc, enc_lens = fsst.encode(data, starts, table)
    return (bytes([FSST_STR])
            + fsst.serialize_table(table)
            + _sized(_int_blob(enc_lens))
            + enc.tobytes())


# ---------------------------------------------------------------------------
# Selection + block API
# ---------------------------------------------------------------------------

def encode_str_block(values, text_hint: bool = False
                     ) -> tuple[bytes, StrDescriptor]:
    """Auto-select and encode one string block.

    ``values``: pandas Series or numpy object array of str (no nulls).
    ``text_hint``: force trying FSST even when gates would skip it.
    """
    if isinstance(values, pd.Series):
        values = values.to_numpy()
    n = len(values)
    lengths, data = series_to_bytes(values)
    total_bytes = int(lengths.sum())

    # Reference baseline: plain with lengths at the Oroch model cost.
    len_desc = ic.select(lengths.astype(np.int64), width=4, try_delta=True)
    ref_total = (1 + ic.varint_size_scalar(len_desc.ref_total)
                 + len_desc.ref_total + total_bytes)

    if n == 0:
        blob = _encode_plain(lengths, data)
        return blob, StrDescriptor(PLAIN_STR, 0, ref_total, len(blob))

    codes, uniques = pd.factorize(pd.Series(values), sort=True)
    u = len(uniques)
    nruns = 1 + int(np.count_nonzero(np.diff(codes)))

    best = _encode_plain(lengths, data)
    best_codec = PLAIN_STR
    # Strict-less compare in fixed order (dict, rle, fsst) — mirrors the
    # reference's compare discipline (`integer_codec.h:405-420`).
    if u <= max(1, int(n * DICT_MAX_RATIO)) or u <= 256:
        if u <= DICT_MAX_ABS:
            cand = _encode_dict(codes, uniques)
            if len(cand) < len(best):
                best, best_codec = cand, DICT_STR
    if nruns <= max(1, int(n * RLE_MAX_RATIO)):
        cand = _encode_rle(codes, values)
        if len(cand) < len(best):
            best, best_codec = cand, RLE_STR
    avg = total_bytes / n
    if (text_hint or (avg >= FSST_MIN_AVG_LEN
                      and total_bytes >= FSST_MIN_BYTES
                      and u > n // 8)):
        cand = _encode_fsst(lengths, data)
        if cand is not None and len(cand) < len(best):
            best, best_codec = cand, FSST_STR

    return best, StrDescriptor(best_codec, n, ref_total, len(best))


def decode_str_block(blob: bytes, n: int) -> pd.Series:
    tag = blob[0]
    pos = 1
    if tag == PLAIN_STR:
        len_blob, pos = _read_sized(blob, pos)
        lengths = ic.decode_block(len_blob, n, width=4)
        data = np.frombuffer(blob, dtype=np.uint8, offset=pos)
        return bytes_to_series(lengths, data[: int(lengths.sum())])
    if tag == DICT_STR:
        ndict, pos = ic.varint_decode_scalar(blob, pos)
        dl_blob, pos = _read_sized(blob, pos)
        dlens = ic.decode_block(dl_blob, ndict, width=4)
        dsize = int(dlens.sum())
        ddata = np.frombuffer(blob, dtype=np.uint8, offset=pos, count=dsize)
        pos += dsize
        uniques = bytes_to_series(dlens, ddata).to_numpy()
        codes = ic.decode_block(blob[pos:], n, width=4)
        return pd.Series(uniques[codes], dtype=object)
    if tag == RLE_STR:
        nruns, pos = ic.varint_decode_scalar(blob, pos)
        rl_blob, pos = _read_sized(blob, pos)
        run_len = ic.decode_block(rl_blob, nruns, width=4)
        vl_blob, pos = _read_sized(blob, pos)
        val_len = ic.decode_block(vl_blob, nruns, width=4)
        vdata = np.frombuffer(blob, dtype=np.uint8, offset=pos,
                              count=int(val_len.sum()))
        run_vals = bytes_to_series(val_len, vdata).to_numpy()
        return pd.Series(np.repeat(run_vals, run_len), dtype=object)
    if tag == FSST_STR:
        table, pos = fsst.deserialize_table(blob, pos)
        el_blob, pos = _read_sized(blob, pos)
        enc_lens = ic.decode_block(el_blob, n, width=4)
        enc = np.frombuffer(blob, dtype=np.uint8, offset=pos,
                            count=int(enc_lens.sum()))
        data, dec_lens = fsst.decode_split(enc, enc_lens, table)
        return bytes_to_series(dec_lens, data)
    raise ValueError(f"bad string codec tag {tag}")
