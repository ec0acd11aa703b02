"""N-gram language-model perplexity scoring (CCNet-style quality filter).

Shape from Wenzek et al. 2020 (CCNet): train a small LM on a trusted
reference corpus (they use Wikipedia + KenLM), score every candidate web
page by per-token log-probability, and keep the low-perplexity tail —
the single most load-bearing quality signal in the CCNet/LLaMA data
recipe.  Suffix-array KenLM binaries don't distribute as DataFrames; the
Spark-first re-expression is a bigram stupid-backoff model (Brants et
al. 2007, "Large Language Models in Machine Translation") kept entirely
in DataFrames:

  fit:    one groupBy over reference unigrams, one over reference
          bigrams — the model IS two count tables plus a 1-row total;
  score:  explode candidate docs to (id, h(w_prev), h(w)) fixed-width
          triples, hash-join the two count tables on 8-byte keys, and
          partial-aggregate the per-token log10 probabilities back to
          one row per document (pairs of a doc are generated co-located,
          so the map-side combiner collapses them before the shuffle).

Scoring rule (deterministic, SQL-replayable):

  S(w | w_prev) = c(w_prev w) / c(w_prev)        if the bigram was seen
                = alpha * c(w) / N               else, w seen in ref
                = alpha * alpha / N              else (OOV floor)

  doc score = mean(log10 S) over the doc's n-1 bigram positions;
  perplexity = 10^(-score).  Docs with < 2 tokens score NULL.

Model-size regimes at 100 TB: the reference corpus is the SMALL side by
construction (CCNet's Wikipedia LM, not the crawl) — a pruned bigram
table is tens of millions of rows; AQE broadcasts it when it fits and
falls back to a shuffled hash join on the 8-byte word-hash keys when it
doesn't (`broadcast_model=True` forces the hint, mirroring CCNet
shipping the KenLM binary to every worker).  The candidate corpus never
shuffles its text: only (id, hash, hash) triples move, and only when the
model could not be broadcast.

Reference parity note: the reference library (shaia/BloomFilter) has no
LM scoring — this belongs to the training-data-pipeline mandate (driver
brief), modeled on the published CCNet filtering rule.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

from bloomfilter_spark.plans.skew import ensure_parallelism


class BigramLM(NamedTuple):
    """A fitted stupid-backoff bigram model, fully lazy (no driver state):
    ``uni``: (h, c) unigram counts keyed by xxhash64(word);
    ``bi``: (h1, h2, c) bigram counts keyed by the word-hash pair;
    ``totals``: 1-row (n_ref_tokens); ``alpha``: the backoff discount."""

    uni: DataFrame
    bi: DataFrame
    totals: DataFrame
    alpha: float


def _toks(text_col: str):
    """The library-wide FILTERED tokenizer (textstats.tokens_nonempty):
    F.trim strips only spaces while split keeps boundary empties, so
    un-filtered tokenization would mint phantom '' tokens from any
    leading/trailing tab/newline (most web pages end with one) —
    inflating n_tokens and polluting the fitted model with '' as a
    high-frequency word."""
    from bloomfilter_spark.functions.textstats import tokens_nonempty

    return tokens_nonempty(F.coalesce(F.col(text_col), F.lit(""))).alias(
        "toks"
    )


def fit_bigram_lm(
    ref_df: DataFrame,
    text_col: str,
    alpha: float = 0.4,
    min_count: int = 1,
) -> BigramLM:
    """Fit the model from a reference corpus: two count aggregations.

    min_count > 1 prunes rare n-grams (CCNet prunes its KenLM the same
    way) — shrinks the model toward broadcast range at a quantified
    accuracy cost; pruned entries simply fall through to the backoff
    term at scoring time.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    ref = ensure_parallelism(ref_df).select(_toks(text_col))
    words = ref.select(F.explode("toks").alias("w"))
    uni = (
        words.groupBy(F.xxhash64("w").alias("h"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    # totals BEFORE pruning: N is the real token mass, so pruning only
    # redistributes probability into the backoff floor
    totals = words.agg(F.count("*").alias("n_ref_tokens"))
    pairs = ref.filter(F.size("toks") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.struct(
                    F.xxhash64(F.get("toks", i)).alias("h1"),
                    F.xxhash64(F.get("toks", i + 1)).alias("h2"),
                ),
            )
        ).alias("p")
    )
    bi = (
        pairs.select("p.h1", "p.h2")
        .groupBy("h1", "h2")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    return BigramLM(uni=uni, bi=bi, totals=totals, alpha=float(alpha))


def perplexity_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: BigramLM,
    broadcast_model: bool = False,
) -> DataFrame:
    """Score every document against the fitted model.

    Returns (id, n_tokens, n_scored, avg_logp, ppl): n_scored is the
    number of bigram positions (n_tokens - 1, 0 for shorter docs);
    avg_logp is the mean log10 stupid-backoff probability rounded to 6
    decimals; ppl = round(10^(-avg_logp), 6) from the ROUNDED mean so
    the value is reproducible bit-for-bit by any SQL engine.  Docs with
    n_scored = 0 carry NULL avg_logp/ppl.
    """
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), _toks(text_col)
    )
    # both the bigram-pairs branch and the n_tokens join-back read this
    # view; localCheckpoint (same rationale as linededup/spans) so the
    # split/tokenize projection over the candidate corpus runs ONCE
    docs = base.select(
        "id", "toks", F.size("toks").cast("long").alias("n_tokens")
    ).localCheckpoint(eager=False)
    pairs = docs.filter(F.col("n_tokens") >= 2).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_tokens").cast("int") - 2),
                lambda i: F.struct(
                    F.xxhash64(F.get("toks", i)).alias("h1"),
                    F.xxhash64(F.get("toks", i + 1)).alias("h2"),
                ),
            )
        ).alias("p"),
    ).select("id", "p.h1", "p.h2")

    uni, bi = lm.uni, lm.bi
    if broadcast_model:
        uni, bi = F.broadcast(uni), F.broadcast(bi)
    u_prev = uni.select(F.col("h").alias("h1"), F.col("c").alias("c_prev"))
    u_w = uni.select(F.col("h").alias("h2"), F.col("c").alias("c_w"))
    b = bi.select("h1", "h2", F.col("c").alias("c_bi"))

    scored = (
        pairs.join(b, ["h1", "h2"], "left")
        .join(u_prev, "h1", "left")
        .join(u_w, "h2", "left")
        .crossJoin(F.broadcast(lm.totals))
        .select(
            "id",
            F.log10(
                F.when(
                    F.col("c_bi").isNotNull(),
                    F.col("c_bi") / F.col("c_prev"),
                ).otherwise(
                    F.lit(lm.alpha)
                    * F.coalesce(F.col("c_w"), F.lit(lm.alpha))
                    / F.col("n_ref_tokens")
                )
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_scored"),
        F.round(F.avg("logp"), 6).alias("avg_logp"),
    )
    return (
        docs.select("id", "n_tokens")
        .join(per_doc, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce(F.col("n_scored"), F.lit(0))
            .cast("long")
            .alias("n_scored"),
            "avg_logp",
            F.round(F.pow(F.lit(10.0), -F.col("avg_logp")), 6).alias("ppl"),
        )
    )
