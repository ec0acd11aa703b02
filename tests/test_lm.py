"""Bigram stupid-backoff perplexity scoring — CCNet-style quality filter."""

from __future__ import annotations

import math
import re

import pytest

from bloomfilter_spark.operators.lm import BigramLM, fit_bigram_lm, perplexity_score


def _py_toks(t):
    t = (t or "").strip().lower()
    return re.split(r"[ \t\n\f\r]+", t) if t else []


def _py_score(ref_texts, texts, alpha=0.4):
    """Scalar reference implementation of the documented scoring rule."""
    uni, bi, n = {}, {}, 0
    for t in ref_texts:
        ws = _py_toks(t)
        n += len(ws)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    out = []
    for t in texts:
        ws = _py_toks(t)
        lps = []
        for a, b in zip(ws, ws[1:]):
            if (a, b) in bi:
                p = bi[(a, b)] / uni[a]
            else:
                p = alpha * uni.get(b, alpha) / n
            lps.append(math.log10(p))
        if lps:
            avg = round(sum(lps) / len(lps), 6)
            out.append((len(ws), len(lps), avg, round(10 ** (-avg), 6)))
        else:
            out.append((len(ws), 0, None, None))
    return out


def _run(spark, ref_texts, texts, **kw):
    ref = spark.createDataFrame([(t,) for t in ref_texts], "text string")
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    lm = fit_bigram_lm(ref, "text", **{k: v for k, v in kw.items()
                                       if k in ("alpha", "min_count")})
    out = perplexity_score(
        docs, "doc_id", "text", lm,
        broadcast_model=kw.get("broadcast_model", False),
    )
    rows = {r["id"]: r for r in out.collect()}
    return [
        (
            rows[i]["n_tokens"],
            rows[i]["n_scored"],
            rows[i]["avg_logp"],
            rows[i]["ppl"],
        )
        for i in range(len(texts))
    ]


def test_matches_scalar_reference(spark):
    ref = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
    ]
    texts = [
        "the cat sat",          # all bigrams in-model
        "the zebra sat",        # OOV word -> backoff floor
        "cat the on sat",       # seen words, unseen bigrams
        "solo",                 # 1 token -> unscored
        "",                     # empty -> unscored
        None,                   # null -> empty
        "the cat sat\n",        # trailing newline: F.trim strips only
        "\tthe cat sat",        # spaces — boundary \t/\n must NOT mint
        "\t",                   # phantom '' tokens (tokens_nonempty rule)
        " the cat sat ",        # plain-space boundary (trim handles)
    ]
    got = _run(spark, ref, texts)
    want = _py_score(ref, texts)
    assert got == want


def test_boundary_whitespace_ref_corpus_fits_clean_model(spark):
    """A reference corpus whose docs end in newlines (most web pages do)
    must fit the same model as the stripped corpus — no '' unigram, no
    (last_word, '') bigrams."""
    ref_clean = ["the cat sat", "the dog sat"]
    ref_noisy = ["the cat sat\n", "\tthe dog sat"]
    texts = ["the cat sat", "dog the"]
    assert _run(spark, ref_noisy, texts) == _run(spark, ref_clean, texts)


def test_in_domain_scores_lower_perplexity(spark):
    ref = ["the cat sat on the mat"] * 5 + ["the dog ate the bone"] * 5
    texts = ["the cat sat on the mat", "zx qv wk jj pq rr"]
    got = _run(spark, ref, texts)
    assert got[0][3] < got[1][3]  # in-domain ppl << garbage ppl


def test_broadcast_hint_value_identical(spark):
    ref = ["a b c a b", "b c a"]
    texts = ["a b c", "c b a", "q a"]
    assert _run(spark, ref, texts) == _run(
        spark, ref, texts, broadcast_model=True
    )


def test_min_count_prunes_to_backoff(spark):
    # bigram "a b" appears once; with min_count=2 it must fall through to
    # the unigram backoff term, and unigram counts prune the same way
    ref = ["a b", "a c", "a c"]
    texts = ["a b"]
    (n_tok, n_sc, avg, _) = _run(spark, ref, texts, min_count=2)[0]
    # backoff: alpha * c(b)=pruned -> floor alpha*alpha/N, N=6
    want = round(math.log10(0.4 * 0.4 / 6), 6)
    assert (n_tok, n_sc, avg) == (2, 1, want)


def test_validation():
    with pytest.raises(ValueError, match="alpha"):
        fit_bigram_lm(None, "text", alpha=0.0)
    with pytest.raises(ValueError, match="min_count"):
        fit_bigram_lm(None, "text", min_count=0)


def test_fixture_scoring_sane(spark, documents):
    # fit on the en slice, score everything: every scored doc finite,
    # n_scored == n_tokens - 1, and en docs collectively beat non-en
    from pyspark.sql import functions as F

    lm = fit_bigram_lm(documents.filter(F.col("lang") == "en"), "text")
    out = perplexity_score(documents, "doc_id", "text", lm)
    bad = out.filter(
        (F.col("n_tokens") >= 2) & (F.col("n_scored") != F.col("n_tokens") - 1)
    ).count()
    assert bad == 0
    joined = out.join(documents.select("doc_id", "lang"), out.id == F.col("doc_id"))
    means = dict(
        joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("ppl").alias("m"))
        .collect()
    )
    if True in means and False in means:
        assert means[True] < means[False]
