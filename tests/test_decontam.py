"""Eval-set decontamination + PII redaction (operators/decontam.py):
exact against a brute-force Python oracle, normalization invariance,
broadcast/shuffle parity, redaction shape coverage."""
import re

import pytest
from pyspark.sql import Row, functions as F

from oroch_spark.operators import decontam


def _norm(s):
    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


def _grams(s, n):
    toks = _norm(s).split(" ")
    if toks == [""]:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(max(len(toks) - n, 0) + 1)
            if len(toks[i:i + n]) == n or len(toks) <= n}


def _oracle(train, evals, n, min_hits):
    ref = set()
    for t in evals:
        ref |= _grams(t, n)
    out = {}
    for i, t in train:
        hits = len(_grams(t, n) & ref)
        out[i] = (hits, hits >= min_hits)
    return out


EVAL = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "to be or not to be that is the question worth asking today",
]

TRAIN = [
    (0, "The QUICK brown fox, jumps over the lazy dog -- near the town"),
    (1, "completely unrelated content about compression codecs and spark"),
    (2, "prefix words then to be or not to be that is the question "
        "worth asking today and a suffix"),
    (3, "short doc"),
    (4, "the quick brown fox"),  # shorter than n=8: no 8-gram overlap
]


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in TRAIN])
    evals = spark.createDataFrame([Row(text=t) for t in EVAL])
    return train, evals


def test_flags_match_bruteforce_oracle(spark, frames):
    train, evals = frames
    for n, min_hits in [(8, 1), (8, 3), (5, 1)]:
        want = _oracle(TRAIN, EVAL, n, min_hits)
        got = {r.doc_id: (r.n_hits, r.contaminated)
               for r in decontam.contamination_flags(
                   train, evals, n=n, min_hits=min_hits).collect()}
        assert got == want, (n, min_hits)


def test_normalization_hides_cosmetic_edits(spark, frames):
    train, evals = frames
    got = {r.doc_id: r.contaminated
           for r in decontam.contamination_flags(train, evals).collect()}
    assert got[0]          # case/punctuation edits still match
    assert got[2]          # overlap inside a longer doc
    assert not got[1] and not got[3] and not got[4]


def test_broadcast_and_shuffle_agree(spark, frames):
    train, evals = frames
    a = sorted(map(tuple, decontam.contamination_flags(
        train, evals, broadcast=True).collect()))
    b = sorted(map(tuple, decontam.contamination_flags(
        train, evals, broadcast=False).collect()))
    assert a == b


def test_remove_contaminated(spark, frames):
    train, evals = frames
    kept = {r.doc_id for r in decontam.remove_contaminated(
        train, evals).collect()}
    assert kept == {1, 3, 4}


def test_plan_is_udf_free_and_broadcast(spark, frames):
    train, evals = frames
    df = decontam.contamination_flags(train, evals)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_redact_pii_shapes(spark):
    rows = [Row(doc_id=0, text=(
        "mail a.b+c@ex-ample.org, call (555) 123-4567 or 555.123.4567, "
        "ssn 123-45-6789, card 4111 1111 1111 1111, ip 192.168.0.254 "
        "but versions like 1.2.3.4567 and math 3-4 stay"))]
    out = decontam.redact_pii(spark.createDataFrame(rows)).collect()[0].text
    assert "<EMAIL>" in out and "a.b+c" not in out
    assert out.count("<PHONE>") == 2 and "123-4567" not in out
    assert "<SSN>" in out and "<CARD>" in out
    assert "<IP>" in out and "192.168.0.254" not in out
    assert "1.2.3.4567" in out          # not a valid IPv4: untouched
    assert "math 3-4 stay" in out


def test_redact_pii_subset_and_out_col(spark):
    rows = [Row(doc_id=0, text="x@y.io and 123-45-6789")]
    df = decontam.redact_pii(spark.createDataFrame(rows),
                             rules=["email"], out_col="clean")
    r = df.collect()[0]
    assert r.text == "x@y.io and 123-45-6789"      # original kept
    assert r.clean == "<EMAIL> and 123-45-6789"    # only email rule ran
    with pytest.raises(ValueError, match="unknown PII rules"):
        decontam.redact_pii(spark.createDataFrame(rows), rules=["nope"])


def test_redact_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = decontam.redact_pii(docs, out_col="clean")
    # lossless where no PII shape occurs
    n_same = out.filter(F.col("clean") == F.col("text")).count()
    assert n_same + out.filter(F.col("clean") != F.col("text")).count() \
        == docs.count()
