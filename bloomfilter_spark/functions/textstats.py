"""Text-analysis functions for training-data pipelines.

Everything here that feeds an oracle-checked query is pure Catalyst
(`pyspark.sql.functions` — JVM-side, whole-stage codegen, no Python in the
hot path); the SQL equivalents live in queries.py.  The rolling-hash
fingerprinting is the one numpy/pandas-UDF member (not SQL-expressible).

Ops: token counting (whitespace tokenizer), quality scoring (length /
punctuation / digit / stopword ratios), language-ID (marker-word n-gram
heuristic), document fingerprinting (Rabin-Karp rolling hash + winnowing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

# priority-ordered: ties resolve to the earlier language
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "y", "una", "por"],
}

# char-family COUNTS are computed as length(text) - length(translate(text,
# family, "")) — translate is a single-pass char-table delete, identical
# counts to the old length(regexp_replace(text, [^family], "")) but ~13×
# faster, and immune to a JVM JIT pathology where TWO different negated-
# class regexes in ONE codegen'd projection ran 33× slower than either
# alone (measured: alpha 5.3s + digit 7.7s separately, 175.8s combined,
# at 2M pages; translate: all three families in 13.0s)
_PUNCT_CHARS = ".,;:!?"
_DIGIT_CHARS = "0123456789"
_ALPHA_CHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)


def _family_count(c, chars: str):
    return (F.length(c) - F.length(F.translate(c, chars, ""))).cast("double")


# THE whitespace class, spelled explicitly: Java regex \s is
# [ \t\n\x0B\f\r] but RE2 (DuckDB string_split_regex) \s omits \x0B, so a
# literal \s+ on the Spark side diverges from every SQL oracle the first
# time a document contains a vertical tab.  Every Catalyst tokenizer in
# the library splits on this class — which RE2's \s+ matches exactly —
# so Spark and the oracles agree on all byte values.
WS_SPLIT_PATTERN = r"[ \t\n\f\r]+"


def tokens(col) -> Column:
    """Whitespace tokenizer (lowercased) — the RAW rule.

    Two-tier contract, deliberate: F.trim strips only ASCII spaces, so
    text with boundary tab/newline whitespace yields empty edge tokens
    here; `tokens_nonempty` drops them.  Scoring/vocabulary consumers
    (classifier, TF-IDF, n-gram counts, simhash weights, the LM,
    line-dedup votes) use the FILTERED rule; counting and positional
    consumers (token_count, spans, chunking, BM25 dl) use this raw rule,
    pinned cross-engine by every SQL oracle replaying the identical
    split — changing either tier means changing operator and oracle in
    lockstep (see the lm.py r5 fix for the procedure)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), WS_SPLIT_PATTERN)


def tokens_nonempty(col) -> Column:
    """`tokens()` with empty strings dropped — the library-wide filtered
    tokenizer (classifier scoring, n-gram counts, TF-IDF all share it)."""
    return F.filter(tokens(col), lambda t: t != "")


def token_count(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(tokens(c))
    )


def word_ngrams(tokens_col, n: int) -> Column:
    """Space-joined word n-grams from a (pre-filtered, non-empty-token)
    array column — pure Catalyst, no shuffle.  Guard on size < n because
    sequence(1, x) DESCENDS for x < 1 instead of yielding empty."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    starts = F.when(
        F.size(c) >= n, F.sequence(F.lit(1), F.size(c) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(c, i, n)))


def distinct_shingles(toks, n: int) -> Column:
    """DISTINCT space-joined n-grams of a token-array column — the one
    shingle rule the dedup operators and the repetition features share
    (operators/dedup aliases this; a second copy of the sequence-guard
    expression would drift)."""
    return F.when(
        F.size(toks) >= n, F.array_distinct(word_ngrams(toks, n))
    ).otherwise(F.array().cast("array<string>"))


def marker_count(col, words: list[str]) -> Column:
    """How many tokens of `col` are in `words` (with repeats)."""
    return F.size(
        F.filter(tokens(col), lambda t: t.isin(*words))
    )


def lang_id(col) -> Column:
    """Marker-word language heuristic; 'und' when no marker fires.

    Deterministic tie-break: priority order of LANG_MARKERS."""
    scores = {lg: marker_count(col, ws) for lg, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lg in reversed(list(LANG_MARKERS)):
        expr = F.when(scores[lg] == best, F.lit(lg)).otherwise(expr)
    return F.when(best == 0, F.lit("und")).otherwise(expr)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars, n_tokens, punct_ratio, digit_ratio, alpha_ratio,
    stopword_ratio, quality_ok — all Catalyst, all codegen'd."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tokens = token_count(c)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_tokens = F.greatest(n_tokens, F.lit(1)).cast("double")
    punct = _family_count(c, _PUNCT_CHARS)
    digit = _family_count(c, _DIGIT_CHARS)
    alpha = _family_count(c, _ALPHA_CHARS)
    stop = marker_count(c, LANG_MARKERS["en"]).cast("double")
    out = (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("punct_ratio", F.round(punct / safe_chars, 6))
        .withColumn("digit_ratio", F.round(digit / safe_chars, 6))
        .withColumn("alpha_ratio", F.round(alpha / safe_chars, 6))
        .withColumn("stopword_ratio", F.round(stop / safe_tokens, 6))
    )
    return out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5)
        & (F.col("alpha_ratio") >= 0.5)
        & (F.col("digit_ratio") <= 0.3),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition signals (Rae et al. 2021 §A1.1): adds
    n_tokens, uniq_token_ratio, dup_trigram_ratio, top_token_ratio,
    repetition_ok — all Catalyst, one pass over the row, NO shuffle.

    The top-token count avoids an explode→groupBy round trip: sort the
    token array and fold a (prev, run, best) struct through it with
    F.aggregate — max run length of a sorted array IS the mode's count.
    O(n log n) per row inside codegen beats two shuffles keyed by doc id
    at any corpus size."""
    c = F.col(text_col)
    # MATERIALIZE the token array before anything references it inside a
    # higher-order-function lambda: expressions under transform()/aggregate()
    # see no common-subexpression elimination, so an inline split() would
    # re-tokenize the whole document once PER shingle index — quadratic in
    # document length (same trap ngram_jaccard_pairs documents)
    df = df.withColumn("__toks", tokens(c))
    toks = F.col("__toks")
    n_tokens = F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(F.size(toks))
    safe = F.greatest(n_tokens, F.lit(1)).cast("double")
    n_uniq = F.size(F.array_distinct(toks))
    total_tri = F.greatest(n_tokens - 2, F.lit(0))
    distinct_tri = F.size(distinct_shingles(toks, 3))
    run = lambda acc, t: F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1))
    top = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            run(acc, t).alias("run"),
            F.greatest(acc.best, run(acc, t)).alias("best"),
        ),
        lambda acc: acc.best,
    )
    out = (
        df.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "uniq_token_ratio",
            F.when(n_tokens == 0, F.lit(1.0)).otherwise(
                F.round(n_uniq.cast("double") / safe, 6)
            ),
        )
        .withColumn(
            "dup_trigram_ratio",
            F.when(
                total_tri > 0,
                F.round(
                    F.lit(1.0) - distinct_tri.cast("double") / total_tri.cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "top_token_ratio",
            F.when(n_tokens == 0, F.lit(0.0)).otherwise(
                F.round(top.cast("double") / safe, 6)
            ),
        )
    )
    # thresholds compare the ROUNDED columns so the boolean is replayable
    # bit-for-bit by the SQL oracle
    return out.withColumn(
        "repetition_ok",
        (F.col("dup_trigram_ratio") <= 0.3) & (F.col("top_token_ratio") <= 0.3),
    ).drop("__toks")


# ---------------------------------------------------------------------------
# Rolling-hash fingerprinting (Rabin-Karp + winnowing) — vectorized numpy
# ---------------------------------------------------------------------------

_RK_BASE = 1000003
_RK_MOD = 2147483647  # 2^31-1 (Mersenne): products/sums stay far below 2^63,
# so the identical arithmetic is expressible in ANSI-SQL BIGINT (DuckDB
# raises on 64-bit overflow — wrap-around 2^64 hashing would not be
# oracle-able).  31-bit fingerprints are the classic MOSS regime.
_K_DEFAULT = 8  # gram size in bytes
_W_DEFAULT = 16  # winnowing window


def _rolling_hashes(flat: np.ndarray, offsets: np.ndarray, k: int) -> tuple:
    """All k-byte Rabin-Karp hashes (mod 2^31-1) per doc: k shifted-column
    accumulation passes over the flat byte buffer into one N-vector, then
    doc-boundary windows masked out via offsets.
    h = (Σ_j byte_j · BASE^(k-1-j) mod P) mod P — byte·power < 2^39, the
    8-term sum < 2^42: exact in uint64 AND in SQL BIGINT."""
    n_docs = len(offsets) - 1
    if len(flat) < k:
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, np.int64)
    powers = np.array(
        [pow(_RK_BASE, k - 1 - j, _RK_MOD) for j in range(k)], dtype=np.uint64
    )
    # k shifted-column passes instead of a windowed matrix: the
    # sliding_window_view + astype(uint64) form materialized 64 bytes per
    # input byte (GBs on page-sized batches); this accumulates into one
    # N-vector.  Sum < k·255·2³¹ < 2⁴² — exact in uint64 before the mod.
    n_win = len(flat) - k + 1
    hashes = np.zeros(n_win, dtype=np.uint64)
    for j in range(k):
        hashes += flat[j : j + n_win].astype(np.uint64) * powers[j]
    hashes %= np.uint64(_RK_MOD)
    # valid window starts per doc: [offsets[i], offsets[i+1] - k]
    starts = offsets[:-1]
    ends = np.maximum(offsets[1:] - k + 1, starts)
    counts = ends - starts
    out_offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    total = int(out_offsets[-1])
    take = np.repeat(starts, counts) + (
        np.arange(total) - np.repeat(out_offsets[:-1], counts)
    )
    return hashes[take], out_offsets


def fingerprint_series(
    texts: pd.Series, k: int = _K_DEFAULT, w: int = _W_DEFAULT
) -> pd.Series:
    """Winnowed fingerprints per document: the set of window-minimum rolling
    hashes (as sorted int64), the classic MOSS scheme.  Deterministic pure
    function of the text bytes."""
    from bloomfilter_spark.functions.hashing import bytes_view_of_strings

    flat, offsets = bytes_view_of_strings(texts)
    hashes, h_off = _rolling_hashes(flat, offsets, k)
    out = []
    for i in range(len(h_off) - 1):
        h = hashes[h_off[i] : h_off[i + 1]]
        if len(h) == 0:
            out.append([])
            continue
        if len(h) <= w:
            mins = np.array([h.min()])
        else:
            mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
        out.append(np.unique(mins).view(np.int64).tolist())
    return pd.Series(out, index=texts.index)


def with_fingerprints(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprints",
    k: int = _K_DEFAULT, w: int = _W_DEFAULT,
) -> DataFrame:
    from bloomfilter_spark.plans.skew import ensure_parallelism

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _fp(s: pd.Series) -> pd.Series:
        return fingerprint_series(s, k=k, w=w)

    return ensure_parallelism(df).withColumn(out_col, _fp(text_col))


def compression_features(df, text_col: str = "text", id_col: str = "doc_id"):
    """MassiveText/RefinedWeb-style compression-ratio quality signal.

    ratio = len(zlib(utf8(text), level=6)) / max(1, len(utf8(text))) —
    highly repetitive or templated text compresses far below natural
    prose (~0.4-0.7), and near-random strings sit near 1.0.  Returns
    (id_col, n_bytes, n_compressed, compression_ratio round 6,
    compression_ok = ratio >= 0.25): the filter drops machine-generated
    repetition, the classic use.

    zlib level 6 output is deterministic for a given input on every
    CPython build (fixed zlib algorithm), so the operator is exactly
    reproducible — but NO SQL oracle exists (DuckDB has no zlib), so the
    catalog entry is rows-only and the values are pinned by pytest golden
    assertions instead.

    Execution: mapInPandas over Arrow batches — one zlib.compress per
    row (C speed, releases the GIL), no shuffle, map-only at any scale.
    """
    import zlib
    from typing import Iterator as _Iter

    import pandas as _pd

    from pyspark.sql import types as _T

    # the id travels as a STRING through the Arrow boundary and is cast
    # back afterwards: an int batch containing a null arrives as float64,
    # and a float64 round-trip silently corrupts ids above 2^53 — the
    # string form is lossless for any value and for NULLs
    id_dt = df.schema[id_col].dataType
    schema = _T.StructType(
        [
            _T.StructField("id", _T.StringType()),
            _T.StructField("n_bytes", _T.LongType()),
            _T.StructField("n_compressed", _T.LongType()),
            _T.StructField("compression_ratio", _T.DoubleType()),
            _T.StructField("compression_ok", _T.BooleanType()),
        ]
    )

    def run(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf[text_col]
            ]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, 6)) for b in raw]
            ratio = [
                round(c / max(1, n), 6) for c, n in zip(nc, nb)
            ]
            yield _pd.DataFrame(
                {
                    "id": pdf["__id_str"],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "compression_ratio": ratio,
                    "compression_ok": [r >= 0.25 for r in ratio],
                }
            )

    from bloomfilter_spark.plans.skew import ensure_parallelism

    from pyspark.sql import functions as _F

    src_df = df.select(
        _F.col(id_col).cast("string").alias("__id_str"),
        _F.col(text_col).alias(text_col),
    )
    return (
        ensure_parallelism(src_df)
        .mapInPandas(run, schema=schema)
        .withColumn(id_col, _F.col("id").cast(id_dt))
        .drop("id")
        .select(id_col, "n_bytes", "n_compressed",
                "compression_ratio", "compression_ok")
    )
