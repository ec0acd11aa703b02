"""Hashed linear classifier: python-reference replay, explicit weights,
degenerate docs, and validation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.functions.classifier import _SCALE, _WSPACE, classifier_scores


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_score(text: str, dim: int, salt: str) -> tuple[int, float]:
    toks = [t for t in text.strip().lower().split() if t]
    raw = 0
    for t in toks:
        b = _h60(t) % dim
        raw += (_h60(f"w:{salt}:{b}") % _WSPACE) - _SCALE
    return len(toks), (raw / (len(toks) * _SCALE) if toks else 0.0)


def test_matches_python_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "  Spark   SQL\twith   IRREGULAR whitespace \n tokens "),
        (3, "unicode tøkens señor 北京 mixed"),
        (4, "repeat repeat repeat repeat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit"])
        for r in classifier_scores(df, "text", dim=64, salt="t").collect()
    }
    for doc_id, text in rows:
        n, logit = _ref_score(text, 64, "t")
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(logit, abs=1e-12)


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "word")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in classifier_scores(df, "text").collect()}
    for i in (1, 2):
        assert got[i]["n_tokens"] == 0
        assert got[i]["logit"] == 0.0
        assert got[i]["keep"] is False
    # null text scores exactly like empty text (oracle-aligned)
    assert got[3]["n_tokens"] == 0
    assert got[3]["logit"] == 0.0
    assert got[3]["keep"] is False
    assert got[4]["n_tokens"] == 1


def test_explicit_weights_and_threshold(spark):
    df = spark.createDataFrame([(1, "a a b"), (2, "b b b")], "doc_id long, text string")
    dim = 8
    ba, bb = _h60("a") % dim, _h60("b") % dim
    assert ba != bb
    w = [0] * dim
    w[ba], w[bb] = _SCALE - 1, -(_SCALE)
    got = {
        r["doc_id"]: r
        for r in classifier_scores(df, "text", dim=dim, weights=w).collect()
    }
    # doc1: 2*(S-1) - S > 0 ; doc2: 3*(-S) < 0
    assert got[1]["keep"] is True and got[2]["keep"] is False
    assert got[1]["logit"] == pytest.approx((2 * (_SCALE - 1) - _SCALE) / (3 * _SCALE))
    # threshold moves the gate, decided in integer space
    hi = classifier_scores(df, "text", dim=dim, weights=w, threshold=0.5).collect()
    assert all(not r["keep"] for r in hi)


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        classifier_scores(df, "text", dim=0)
    with pytest.raises(ValueError):
        classifier_scores(df, "text", dim=4, weights=[1, 2])
    with pytest.raises(ValueError):
        classifier_scores(df, "text", dim=2, weights=[0, _WSPACE])


def test_map_only_plan(spark, documents):
    plan = classifier_scores(documents, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure map-side scoring
