"""Tokenizer-aware token budgeting — model-token counts, not whitespace.

Training-data budgets are written in MODEL tokens (BPE/SentencePiece), not
whitespace words.  The true tokenizer is an iterative greedy merge that no
engine-portable SQL can replay, so this module implements the standard
budgeting approximation used when the tokenizer itself can't ship with the
query — a *pluggable-vocabulary piece estimator*:

    pieces(word) = n_pieces(word)            if word is in the vocabulary
                 = ceil(len(word) / L)       otherwise (rare-word fallback)

with the vocabulary either (a) supplied by the caller as a (word,
n_pieces) mapping exported from a real tokenizer — then the estimate IS
the model count for every in-vocab word — or (b) derived from the corpus
itself: the `top_k` most document-frequent words count as single tokens,
mirroring the empirical fact that BPE assigns whole-word tokens to
frequent words.  `L` defaults to 4 characters per piece (the published
~4-chars/token rule of thumb for English BPE vocabularies).

Everything is a Catalyst plan: tokenize -> explode -> broadcast-join the
vocabulary -> conditional piece count -> per-doc sum.  The corpus-derived
vocabulary costs one extra aggregation over the exploded words (map-side
combine collapses it: the key space is the vocabulary, not the corpus);
the join side is `top_k` rows and always broadcasts.  Per-row work is
whole-stage codegen; no Python in the hot path.  SQL-replayable: the
DuckDB oracle replays the same vocabulary CTE and the same CASE formula
(see queries_dataops._TOKEN_BUDGET_SQL).

No reference analog (the Go library has no text ops); this completes the
text-analysis story the driver brief lists (token counting for budgets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bloomfilter_spark.functions.textstats import tokens_nonempty
from bloomfilter_spark.plans.skew import ensure_parallelism

DEFAULT_CHARS_PER_PIECE = 4


def _prepared_vocab(vocab: DataFrame) -> DataFrame:
    """Reserved-name projection of a (word, n_pieces) vocabulary, deduped:
    a duplicate word row would fan out the left join and silently inflate
    both n_words and the piece sums, so conflicting duplicates collapse
    deterministically to the smallest piece count.  Words are lowercased
    to match the corpus tokenizer (tokens() lowercases) — a case-sensitive
    tokenizer export would otherwise silently treat every capitalized
    entry as out-of-vocab."""
    return (
        vocab.select(
            F.lower(F.col("word")).alias("__v_word"),
            F.col("n_pieces").cast("long").alias("__v_pieces"),
        )
        .groupBy("__v_word")
        .agg(F.min("__v_pieces").alias("__v_pieces"))
    )


def _pieces_expr(chars_per_piece: int) -> Column:
    """Piece count for one joined word row: the vocabulary's count when
    the word matched, else ceil(len/L).  The ONE formula both token_budget
    and budget_by_group ship, and the one the SQL oracle replays."""
    return F.coalesce(
        F.col("__v_pieces"),
        F.ceil(F.length("__word") / F.lit(float(chars_per_piece))).cast("long"),
    )


def corpus_vocabulary(
    df: DataFrame, text_col: str, top_k: int = 30_000
) -> DataFrame:
    """The `top_k` most document-frequent words, as (word, n_pieces=1).

    Document frequency (not term frequency) so a single spammy document
    cannot vote a rare word into the vocabulary.  Ties broken by word so
    the vocabulary — and every count derived from it — is deterministic.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # ensure_parallelism: the explode + partial aggregation here is the
    # most CPU-heavy stage of the whole estimator and must not serialize
    # on a one-split parquet input
    words = ensure_parallelism(df.select(text_col)).select(
        F.explode(F.array_distinct(tokens_nonempty(text_col))).alias("word")
    )
    by_df = words.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return (
        by_df.orderBy(F.col("df").desc(), F.col("word").asc())
        .limit(top_k)
        .select("word", F.lit(1).alias("n_pieces"))
    )


def token_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame | None = None,
    top_k: int = 30_000,
    chars_per_piece: int = DEFAULT_CHARS_PER_PIECE,
) -> DataFrame:
    """Per-document model-token estimates.

    Returns (id_col, n_words, n_tokens_est) where n_tokens_est sums, over
    the document's words, the vocabulary piece count for in-vocab words
    and ceil(len/chars_per_piece) for out-of-vocab words.  Empty/NULL
    text scores 0 tokens (rows pass through — map-only null contract).

    vocab: optional (word, n_pieces) DataFrame exported from a real
    tokenizer; when None, `corpus_vocabulary(df, text_col, top_k)` is
    derived from the corpus itself.  The vocab is broadcast — keep it
    tokenizer-sized (10^4..10^5 rows), which it is by construction.
    """
    if chars_per_piece < 1:
        raise ValueError(f"chars_per_piece must be >= 1, got {chars_per_piece}")
    if vocab is None:
        vocab = corpus_vocabulary(df, text_col, top_k)
    vocab = _prepared_vocab(vocab)
    exploded = ensure_parallelism(df.select(id_col, text_col)).select(
        id_col, F.explode_outer(tokens_nonempty(text_col)).alias("__word")
    )
    # explode_outer keeps empty/NULL-text docs as a NULL-word row, so they
    # come back with n_words = 0 instead of vanishing
    scored = exploded.join(
        F.broadcast(vocab), exploded["__word"] == F.col("__v_word"), "left"
    ).select(
        id_col,
        F.when(F.col("__word").isNull(), F.lit(0))
        .otherwise(_pieces_expr(chars_per_piece))
        .alias("__pieces"),
        F.when(F.col("__word").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .alias("__is_word"),
    )
    return scored.groupBy(id_col).agg(
        F.sum("__is_word").alias("n_words"),
        F.sum("__pieces").alias("n_tokens_est"),
    )


def budget_by_group(
    df: DataFrame,
    group_col: str,
    text_col: str,
    vocab: DataFrame | None = None,
    top_k: int = 30_000,
    chars_per_piece: int = DEFAULT_CHARS_PER_PIECE,
) -> DataFrame:
    """Token budget rolled up per group (source/lang) — the number a
    data-mixing plan is written against.

    Aggregates the exploded word stream straight to the group key (no
    per-document intermediate, no join back against the corpus — a 2M-doc
    measurement showed that join dominating the whole pipeline 4:1);
    n_docs comes from a second column-pruned scan that only reads
    group_col, and the final join is group-cardinality × group-cardinality.
    """
    if chars_per_piece < 1:
        raise ValueError(f"chars_per_piece must be >= 1, got {chars_per_piece}")
    if vocab is None:
        vocab = corpus_vocabulary(df, text_col, top_k)
    vocab = _prepared_vocab(vocab)
    exploded = ensure_parallelism(df.select(group_col, text_col)).select(
        group_col, F.explode(tokens_nonempty(text_col)).alias("__word")
    )
    tokens_agg = (
        exploded.join(
            F.broadcast(vocab), exploded["__word"] == F.col("__v_word"), "left"
        )
        .select(group_col, _pieces_expr(chars_per_piece).alias("__pieces"))
        .groupBy(group_col)
        .agg(F.sum("__pieces").alias("tokens_est"))
    )
    docs_agg = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    # eqNullSafe: groupBy keeps a NULL group key in BOTH aggregates, but a
    # plain equality join would never pair them — the unlabeled slice's
    # budget would silently read 0
    return docs_agg.join(
        tokens_agg,
        docs_agg[group_col].eqNullSafe(tokens_agg[group_col]),
        "left",
    ).select(
        docs_agg[group_col],
        "n_docs",
        F.coalesce("tokens_est", F.lit(0)).alias("tokens_est"),
    )


def token_budget_expr(
    col, chars_per_piece: int = DEFAULT_CHARS_PER_PIECE
) -> Column:
    """The no-vocabulary fallback as a single map-only expression:
    Σ ceil(len(word)/L) over whitespace words — zero joins, zero shuffle,
    for quick budget scans where ±15% is fine.  NULL/empty text scores 0
    (same contract as token_budget)."""
    return F.coalesce(
        F.aggregate(
            tokens_nonempty(col),
            F.lit(0).cast("long"),
            lambda acc, w: acc
            + F.ceil(F.length(w) / F.lit(float(chars_per_piece))).cast("long"),
        ),
        F.lit(0).cast("long"),
    )
