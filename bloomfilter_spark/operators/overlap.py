"""Corpus-overlap estimation between document sources (MinHash signatures).

The data-mixing diligence question — "how much does source A's content
overlap source B's?" — answered at corpus scale with ONE aggregated
MinHash signature per source over the source's word-shingle set, instead
of any pairwise document join.

Spark-first plan (the 100 TB story):
- the shingle explode is map-only;
- the per-source signature is a single ``groupBy(source)`` with
  ``num_perm`` ``min()`` aggregates — partial (map-side) aggregation
  collapses every input partition to ``n_sources × num_perm`` longs
  before the ONLY shuffle, so the shuffle payload is independent of
  corpus size;
- the pairwise comparison runs over ``n_sources²`` signature rows
  (broadcast self-join — sources number in the dozens, not millions).
Nothing except the map-side scan grows with the corpus; contrast the
exact baseline below, whose shingle self-join is the thing MinHash
replaces (same trade as `operators/dedup.py`, but at corpus rather
than document granularity).

Estimator: for permutation j, ``sig_j(S) = min_{s∈S} h_j(s)`` and
``P[sig_j(A) = sig_j(B)] = J(A, B)`` (Broder 1997), so the match
fraction across ``num_perm`` permutations is an unbiased estimate of
the shingle-set Jaccard with stderr ``≈ sqrt(J(1−J)/num_perm)``.

Cross-engine rule: ONE ``md5_hash60(s)`` per shingle (the library's one
SQL-replayable hash), then ``num_perm`` Carter–Wegman permutations
``h_j(x) = (a_j·x + c_j) mod (2⁶¹−1)`` with 31-bit ``a_j`` — the same
permutation trick the document-level MinHash fast path uses
(`dedup._perm_params`), re-derived so BOTH engines can evaluate it in
plain 64-bit integers (Spark ANSI and DuckDB BIGINT both refuse
overflow; a naive ``a·x`` needs 91 bits).  With ``x = hi·2³⁰ + lo``
and ``u = a·hi`` (< 2⁶¹, exact), the identity ``2⁶¹ ≡ 1 (mod 2⁶¹−1)``
gives::

    a·x + c ≡ (u >> 31) + (u & (2³¹−1))·2³⁰ + a·lo + c   (mod 2⁶¹−1)

— every intermediate < 2⁶³, yet the multiplier wraps the modulus ~2³⁰
times, which is what makes the map min-wise mixing (a low-coefficient
affine form that wraps ≤ once is nearly monotone and biases the
estimate badly — pinned by the bound test).  Hashing the shingle once
instead of num_perm times cuts the map-side cost ~10×; the standard
one-hash MinHash trade applies (shingles colliding in the 60-bit base
hash collide in all permutations).  The whole ESTIMATE is therefore
verifiable value-for-value in DuckDB; catalog query ``corpus_overlap``
carries the full oracle.

Group-key policy (library-wide): NULL group keys fold into an explicit
``'(none)'`` bucket.  Sources whose documents yield zero shingles
(all-NULL / shorter than n tokens) have no signature and appear in no
pair — an empty set has no MinHash.

Reference parity: the reference is a single-sketch library with no
corpus operator (bloomfilter.go has only per-filter ops); this extends
its MinHash-adjacent surface the way SURVEY.md §2.3 companions do.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from bloomfilter_spark.functions.hashing import md5_hash60
from bloomfilter_spark.operators.dedup import exploded_shingles

NONE_BUCKET = "(none)"

MERSENNE61 = (1 << 61) - 1
_LO_MASK = (1 << 30) - 1


def perm_constants(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, c_j) for the affine permutations: 31-bit values
    from md5 of the permutation index, a forced odd (nonzero).  Fixed
    scheme = part of the signature format; the Catalyst expressions and
    the SQL oracle interpolate the SAME literals."""
    out = []
    for j in range(num_perm):
        d = hashlib.md5(f"overlap-perm:{j}".encode()).digest()
        a = (int.from_bytes(d[0:4], "big") & 0x7FFFFFFF) | 1
        c = int.from_bytes(d[8:12], "big") & 0x7FFFFFFF
        out.append((a, c))
    return out


def _grouped_shingles(
    df: DataFrame, text_col: str, group_col: str, n: int
) -> DataFrame:
    """(grp, s) rows: one row per DISTINCT shingle per document.

    Per-doc duplicates were always removed (`_shingles_of` applies
    array_distinct); duplicates ACROSS docs of a group are kept — fine,
    since ``min()`` (and the exact baseline's DISTINCT) are idempotent
    and an early per-group distinct would itself be a shuffle.  Uses the
    Arrow-batched shingler (see `exploded_shingles`) — same pinned
    output, ~16x cheaper than the higher-order-function expression."""
    grp = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit(NONE_BUCKET)).alias(
            "grp"
        ),
        F.col(text_col).alias("__text"),
    )
    return exploded_shingles(grp, "grp", "__text", n).select(
        F.col("id").alias("grp"), F.col("shingle").alias("s")
    )


def source_minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    num_perm: int = 32,
    n: int = 3,
) -> DataFrame:
    """One MinHash signature row per group: (grp, m0..m{num_perm-1}).

    Each ``m_j = min((a_j·x + c_j) mod (2⁶¹−1))`` over the group's
    shingle hashes x, evaluated in overflow-free 64-bit form (module
    docstring).  One aggregation, map-side combined."""
    if num_perm < 1:
        raise ValueError(f"num_perm must be >= 1, got {num_perm}")
    sh = _grouped_shingles(df, text_col, group_col, n)
    h = md5_hash60(F.col("s"))
    hashed = sh.select(
        "grp",
        F.shiftrightunsigned(h, 30).alias("hi"),
        h.bitwiseAND(F.lit(_LO_MASK)).alias("lo"),
    )
    mins = []
    for j, (a, c) in enumerate(perm_constants(num_perm)):
        u = F.col("hi") * F.lit(a)  # < 2^61, exact
        folded = (
            F.shiftrightunsigned(u, 31)
            + u.bitwiseAND(F.lit(0x7FFFFFFF)) * F.lit(1 << 30)
            + F.col("lo") * F.lit(a)
            + F.lit(c)
        )
        mins.append(F.min(F.pmod(folded, F.lit(MERSENNE61))).alias(f"m{j}"))
    return hashed.groupBy("grp").agg(*mins)


def corpus_overlap_minhash(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    num_perm: int = 32,
    n: int = 3,
) -> DataFrame:
    """Estimated shingle-set Jaccard for every unordered group pair.

    Returns (source_a, source_b, est_jaccard) with source_a < source_b;
    est_jaccard is an exact multiple of 1/num_perm (rounded to 6 decimals
    for cross-engine hash stability — lossless when num_perm divides 10^6
    scaled powers of 2, e.g. the default 32)."""
    sig = source_minhash_signatures(df, text_col, group_col, num_perm, n)
    cols = [f"m{j}" for j in range(num_perm)]
    a = sig.select(
        F.col("grp").alias("source_a"), F.array(*cols).alias("sig_a")
    )
    b = sig.select(
        F.col("grp").alias("source_b"), F.array(*cols).alias("sig_b")
    )
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
    matched = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        F.round(matched / F.lit(float(num_perm)), 6).alias("est_jaccard"),
    )


def corpus_overlap_exact(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard per group pair — the small-scale oracle
    baseline the MinHash estimate is tested against.  The shingle
    self-join makes this the non-scale path by construction (documented
    trade; see module docstring)."""
    sh = _grouped_shingles(df, text_col, group_col, n).distinct()
    sz = sh.groupBy("grp").agg(F.count("*").alias("sz"))
    left = sh.select(F.col("grp").alias("ga"), F.col("s").alias("sa"))
    right = sh.select(F.col("grp").alias("gb"), F.col("s").alias("sb"))
    inter = (
        left.join(right, (F.col("sa") == F.col("sb")) & (F.col("ga") < F.col("gb")))
        .groupBy(F.col("ga").alias("source_a"), F.col("gb").alias("source_b"))
        .agg(F.count("*").alias("inter"))
    )
    za = sz.select(F.col("grp").alias("source_a"), F.col("sz").alias("sz_a"))
    zb = sz.select(F.col("grp").alias("source_b"), F.col("sz").alias("sz_b"))
    # full pair grid (left join, inter coalesced to 0): the estimator
    # emits EVERY group pair including est_jaccard = 0.0, so the exact
    # baseline must return the same pair universe — a disjoint pair gets
    # jaccard 0.0, not a missing row (an estimate-vs-exact join would
    # otherwise silently skip exactly the pairs where a collision-induced
    # nonzero estimate most needs checking)
    grid = za.crossJoin(zb).filter(F.col("source_a") < F.col("source_b"))
    return (
        grid.join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )
