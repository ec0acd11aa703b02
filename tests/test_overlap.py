"""Corpus-overlap estimation (operators/overlap.py).

Contracts pinned here:
- estimator bound: |est − exact| within the MinHash error envelope on
  planted overlapping sources (including J=1 exactly and J=0);
- determinism / partitioning invariance: same signatures at 1 and 8
  partitions (min is commutative — the whole point of the design);
- NULL policy: NULL source folds into '(none)', shingle-less sources
  produce no signature and no pair;
- signature replayability: m_j equals a plain-Python md5 replay.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from pyspark.sql import functions as F

from bloomfilter_spark.operators.overlap import (
    NONE_BUCKET,
    corpus_overlap_exact,
    corpus_overlap_minhash,
    source_minhash_signatures,
)

K = 64  # permutations used by the bound test (tighter envelope than catalog)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().strip().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if (a | b) else 0.0


@pytest.fixture(scope="module")
def planted(spark):
    # src_a and src_b share half their sentences; src_c is disjoint;
    # src_dup duplicates src_a exactly (J = 1 must be estimated as 1).
    base = [f"alpha beta gamma delta epsilon zeta token{i} eta theta" for i in range(20)]
    only_b = [f"iota kappa lambda mu nu xi word{i} omicron pi" for i in range(20)]
    only_c = [f"rho sigma tau upsilon phi chi item{i} psi omega" for i in range(20)]
    rows = []
    did = 0
    for t in base:
        rows.append((did, t, "src_a")); did += 1
        rows.append((did, t, "src_dup")); did += 1
    for t in base[:10] + only_b[:10]:
        rows.append((did, t, "src_b")); did += 1
    for t in only_c:
        rows.append((did, t, "src_c")); did += 1
    return rows


def test_estimate_within_bound_and_exact_extremes(spark, planted):
    df = _mk_docs(spark, planted)
    est = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in corpus_overlap_minhash(df, num_perm=K).collect()
    }
    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in corpus_overlap_exact(df).collect()
    }
    # every pair appears in the estimate output (6 pairs for 4 sources)
    assert len(est) == 6
    # identical sources: every permutation min matches — exactly 1.0
    assert est[("src_a", "src_dup")] == 1.0
    # disjoint sources: J=0, any nonzero estimate is a min-collision
    # (astronomically unlikely over 60-bit hashes and these set sizes)
    assert est[("src_a", "src_c")] == 0.0
    # partial overlap: within 4σ of the exact Jaccard (σ = sqrt(J(1-J)/K))
    for pair, e in est.items():
        j = exact.get(pair, 0.0)
        sigma = math.sqrt(max(j * (1 - j), 0.25 / K) / K)
        assert abs(e - j) <= 4 * sigma + 1e-9, (pair, e, j)


def test_signatures_partitioning_invariant_and_replayable(spark):
    rows = [(i, f"one two three four five mark{i} six", "s0") for i in range(40)]
    df = _mk_docs(spark, rows)
    sig1 = source_minhash_signatures(df.coalesce(1), num_perm=8).collect()
    sig8 = source_minhash_signatures(df.repartition(8), num_perm=8).collect()
    assert sorted(map(tuple, sig1)) == sorted(map(tuple, sig8))

    # plain-Python replay with TRUE big-int arithmetic: (a*x + c) mod
    # 2^61-1 directly — proving the engines' overflow-free split form
    # computes exactly the classical Carter-Wegman permutation
    from bloomfilter_spark.operators.overlap import MERSENNE61, perm_constants

    shingle_union = set()
    for _, t, _ in rows:
        shingle_union |= _shingles(t)
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
          for s in shingle_union]
    row = {r["grp"]: r for r in sig1}["s0"]
    for j, (a, c) in enumerate(perm_constants(8)):
        want = min((a * h + c) % MERSENNE61 for h in hs)
        assert row[f"m{j}"] == want, j


def test_null_source_and_shingleless_sources(spark):
    rows = [
        (1, "alpha beta gamma delta", None),      # NULL source → '(none)'
        (2, "alpha beta gamma delta", "real"),
        (3, "too short", "tiny"),                 # < n tokens → no shingles
        (4, None, "nulls"),                       # NULL text → no shingles
    ]
    df = _mk_docs(spark, rows)
    sig = {r["grp"] for r in source_minhash_signatures(df, num_perm=4).collect()}
    assert sig == {NONE_BUCKET, "real"}
    pairs = corpus_overlap_minhash(df, num_perm=4).collect()
    assert len(pairs) == 1
    (p,) = pairs
    # '(none)' < 'real' lexically; identical text → estimate exactly 1
    assert (p["source_a"], p["source_b"]) == (NONE_BUCKET, "real")
    assert p["est_jaccard"] == 1.0


def test_rejects_bad_num_perm(spark):
    df = _mk_docs(spark, [(1, "a b c d", "s")])
    with pytest.raises(ValueError):
        source_minhash_signatures(df, num_perm=0)
