"""Multimodal plumbing: the vectorized Arrow feature kernel must agree
with the per-payload reference stub, handle edge payloads (empty,
short, binary), and contain no per-row Python in the batch path."""
import numpy as np
import pyarrow as pa

from pyspark.sql import functions as F

from oroch_spark.operators import multimodal


def test_tile_matrix_matches_per_row_stub():
    payloads = [b"", b"x", b"a" * 63, b"b" * 64, b"c" * 1000,
                bytes(range(256))]
    arr = pa.array(payloads, type=pa.binary())
    mat, lens = multimodal._tile_matrix(arr)
    assert lens.tolist() == [len(p) for p in payloads]
    for i, p in enumerate(payloads):
        ref = multimodal._decode_image_stub(p)
        assert np.array_equal(mat[i].reshape(8, 8), ref.astype(np.uint8))


def test_tile_matrix_respects_array_offset():
    arr = pa.array([b"skip", b"keep1", b"keep2"], type=pa.binary())
    sliced = arr.slice(1)
    mat, lens = multimodal._tile_matrix(sliced)
    assert lens.tolist() == [5, 5]
    assert bytes(mat[0][:5]) == b"keep1"


def test_extract_features_end_to_end(spark):
    media = multimodal.synthetic_media(spark, n=50, seed=7)
    feats = multimodal.extract_features(media).collect()
    src = {r.media_id: r.payload for r in media.collect()}
    assert len(feats) == 50
    for r in feats:
        ref = multimodal._decode_image_stub(bytes(src[r.media_id]))
        exp = ref.mean(axis=0)
        assert np.allclose(np.array(r.feat, dtype=np.float32), exp)
        assert r.n_bytes == len(src[r.media_id])


def test_media_from_documents_payload_is_utf8(spark):
    docs = spark.createDataFrame([(1, "hello world")],
                                 "doc_id long, text string")
    m = multimodal.media_from_documents(docs).collect()[0]
    assert bytes(m.payload) == b"hello world"
    assert m.media_id == 1
