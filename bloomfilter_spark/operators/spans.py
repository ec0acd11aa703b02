"""Corpus-level repeated-span accounting (ExactSubstr-style dedup).

Shape from Lee et al. 2021 ("Deduplicating Training Data Makes Language
Models Better"): their suffix-array ExactSubstr pass drops any span that
repeats verbatim anywhere in the corpus.  Suffix arrays don't distribute;
the Spark-first re-expression marks a token position as *duplicated* when
any k-gram covering it occurs >= min_count times corpus-wide — the same
signal at k-token resolution, computed with two 8-byte-key shuffles:

  1. positional k-grams -> groupBy(xxhash64(kgram)) frequency count;
  2. hash-join the frequent set back onto the positions (AQE broadcasts
     it when small), explode each hit to its k covered positions, and
     count distinct covered positions per document.

Joining on the 64-bit hash instead of the kgram string keeps the shuffle
payload fixed-width (same w.h.p. argument as ngram_jaccard_pairs); the
exploded coverage rows are k * hits, bounded by k * total tokens.  No
driver-side state, no broadcast of the corpus — the plan survives
corpus-scale inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bloomfilter_spark.plans.skew import ensure_parallelism


def _covered_positions(df, id_col, text_col, k, min_count):
    """(toks_df, covered): the tokenized view and the distinct (id, p)
    token positions covered by a corpus-frequent k-gram — the shared core
    of span STATS and span REMOVAL."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    from bloomfilter_spark.functions.textstats import token_count, tokens

    df = ensure_parallelism(df)
    toks_df = df.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("toks"),
        # library-wide token-count rule (all-whitespace text = 0 tokens)
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    # positional k-grams; materialized once (localCheckpoint) because both
    # the frequency count and the join-back read it
    kg = (
        toks_df.filter(F.col("n_tokens") >= k)
        .select(
            "id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_tokens") - k)
            ).alias("pos"),
            F.col("toks"),
        )
        .select(
            "id",
            "pos",
            F.xxhash64(
                F.concat_ws(" ", F.slice("toks", F.col("pos") + 1, k))
            ).alias("h"),
        )
        .localCheckpoint(eager=False)
    )
    frequent = (
        kg.groupBy("h")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("h")
    )
    covered = (
        kg.join(frequent, "h")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("p"),
        )
        .distinct()
    )
    return toks_df, covered


def duplicate_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Per-document duplicated-span statistics.

    Returns (id, n_tokens, n_dup_tokens, dup_ratio): n_dup_tokens is the
    number of token positions covered by at least one k-gram that occurs
    >= min_count times in the whole corpus; dup_ratio = n_dup_tokens /
    n_tokens (0.0 for empty documents).  Tokenization is the library-wide
    rule: lowercase, trim, split on whitespace.
    """
    toks_df, covered = _covered_positions(df, id_col, text_col, k, min_count)
    per_doc = covered.groupBy("id").agg(
        F.count("*").alias("n_dup_tokens")
    )
    return (
        toks_df.select("id", "n_tokens")
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            # NULL text (n_tokens NULL) keeps NULL stats — a missing
            # document is not a 0-duplication document
            F.when(
                F.col("n_tokens").isNull(), F.lit(None)
            )
            .otherwise(F.coalesce(F.col("n_dup_tokens"), F.lit(0)))
            .cast("long")
            .alias("n_dup_tokens"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("n_dup_tokens"), F.lit(0))
                    / F.col("n_tokens"),
                    6,
                )
            )
            .alias("dup_ratio"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Rewrite each document with its corpus-duplicated spans DELETED —
    the action Lee et al.'s ExactSubstr pass actually takes, at k-token
    resolution: every token position covered by a k-gram occurring >=
    min_count times corpus-wide is dropped, the survivors are re-joined
    with single spaces.

    Returns (id, n_tokens, n_removed, text_clean).  A fully-duplicated
    document becomes the empty string (downstream length filters then
    drop it).  Same two-shuffle plan as duplicate_span_stats plus one
    per-doc covered-positions aggregation; the rewrite itself is a
    map-side array filter."""
    toks_df, covered = _covered_positions(df, id_col, text_col, k, min_count)
    cov = covered.groupBy("id").agg(F.sort_array(F.collect_list("p")).alias("cov"))
    joined = toks_df.join(cov, "id", "left").withColumn(
        "cov", F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    )
    # O(n + c) rebuild: set-subtract the covered positions from the
    # position range (array_except keeps left order), then gather — a
    # per-position array_contains scan would be O(n·c) on boilerplate-
    # heavy documents.  sequence() guard: it DESCENDS for empty docs.
    kept_pos = F.when(
        F.col("n_tokens") > 0,
        F.array_except(
            F.sequence(F.lit(0), F.col("n_tokens") - 1), F.col("cov")
        ),
    ).otherwise(F.array().cast("array<int>"))
    kept = F.transform(kept_pos, lambda i: F.get("toks", i))  # 0-based gather
    # NULL text stays NULL end-to-end (n_tokens is NULL exactly for NULL
    # text): a missing document is NOT a fully-deduplicated one — callers
    # filtering on text_clean = '' must not swallow NULL-text rows
    null_text = F.col("n_tokens").isNull()
    return joined.select(
        "id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.when(null_text, F.lit(None))
        .otherwise(F.size("cov"))
        .cast("long")
        .alias("n_removed"),
        F.when(null_text, F.lit(None).cast("string"))
        .otherwise(F.concat_ws(" ", kept))
        .alias("text_clean"),
    )
