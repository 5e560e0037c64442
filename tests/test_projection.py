"""Projection pushdown into the block format: decode_df(columns=...)
must touch ONLY the requested columns' bytes. Proven by corrupting an
unrequested column's payload slice — the projection still decodes
exactly, while a full decode fails."""
import json

import pytest

from pyspark.sql import functions as F

from oroch_spark import engine


@pytest.fixture(scope="module")
def ctx(spark):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kinds = engine.column_kinds(src.schema)
    blocks = engine.encode_df(src, ["doc_id"], n_buckets=2,
                              text_cols=["text"]).cache()
    blocks.count()
    return src, kinds, blocks


def test_projection_matches_source(spark, ctx):
    src, kinds, blocks = ctx
    got = engine.decode_df(blocks, kinds,
                           columns=["doc_id", "n_chars"]) \
        .orderBy("doc_id").collect()
    exp = src.select("doc_id", "n_chars").orderBy("doc_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]


def _corrupt_text_column(spark, blocks):
    rows = blocks.collect()
    out = []
    for r in rows:
        d = json.loads(r.desc)
        td = next(c for c in d["cols"] if c["n"] == "text")
        p = bytearray(r.payload)
        p[td["o"]:td["o"] + td["l"]] = b"\xff" * td["l"]
        rd = r.asDict()
        rd["payload"] = bytes(p)
        out.append(rd)
    return spark.createDataFrame(out, schema=blocks.schema)


def test_projection_never_touches_unrequested_bytes(spark, ctx):
    src, kinds, blocks = ctx
    bad = _corrupt_text_column(spark, blocks)
    # projection that excludes text decodes perfectly...
    got = engine.decode_df(bad, kinds, columns=["doc_id", "lang"]) \
        .orderBy("doc_id").collect()
    exp = src.select("doc_id", "lang").orderBy("doc_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    # ...while a full decode hits the corrupted bytes and fails
    with pytest.raises(Exception):
        engine.decode_df(bad, kinds).collect()
