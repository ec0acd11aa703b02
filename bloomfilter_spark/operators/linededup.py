"""Corpus-level duplicate-LINE removal (RefinedWeb / MassiveText style).

Shape from Penedo et al. 2023 (RefinedWeb) and Rae et al. 2021
(Gopher/MassiveText): web boilerplate — nav bars, cookie banners,
footers — shows up as the SAME line in MANY documents, and both
pipelines drop any line whose normalized form repeats across enough
documents, keeping the rest of each page intact.  That is a different
signal from ExactSubstr span dedup (operators/spans.py): the unit is a
*line* (newline-delimited), the frequency is *document frequency* (a
line repeated 50× inside ONE page is template noise for span-dedup but
NOT cross-document boilerplate), and the action preserves line order.

Spark-first plan (two fixed-width shuffles, no driver state):

  1. split each document into its line array once; explode to
     (id, pos, xxhash64(normalized line)) and localCheckpoint the
     exploded view because both passes read it;
  2. groupBy(hash) -> approx nothing, EXACT countDistinct(id); lines
     reaching `min_docs` form the boilerplate set;
  3. hash-join the set back (AQE broadcasts it when small — the
     boilerplate set is tiny relative to the corpus by construction),
     collect the covered positions per document, and rebuild the text
     with an array gather (O(lines + hits) per doc, map-side).

Joining on the 64-bit line hash keeps the shuffle payload fixed-width
(same w.h.p. collision argument as ngram_jaccard_pairs); the raw line
strings never shuffle.  Normalization for MATCHING is trim + collapse
internal whitespace + lowercase (cookie banners differ by indentation);
the REBUILT text keeps the original bytes of every surviving line.

Reference parity note: the reference library (shaia/BloomFilter) has no
dedup operators — this belongs to the training-data-pipeline mandate
(driver brief), modeled on the published RefinedWeb/MassiveText rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bloomfilter_spark.plans.skew import ensure_parallelism

#: matching-normalization: collapse horizontal whitespace, trim, lowercase.
#: \f and \r fold too — Windows/CRLF pages must match their Unix twins.
_WS_RUN = r"[ \t\f\r]+"


def _norm_line(col):
    return F.lower(F.trim(F.regexp_replace(col, _WS_RUN, " ")))


def _lines_view(df, id_col: str, text_col: str, min_docs: int):
    """Shared core: (lines_df, covered).

    lines_df: (id, lines array<string>, n_lines) — one row per input row,
    NULL text treated as the empty document (0 lines).
    covered: distinct (id, pos) positions whose normalized line occurs in
    >= min_docs distinct documents (normalized-empty lines never count —
    blank separators are structure, not boilerplate).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    df = ensure_parallelism(df)
    # __rid: a per-ROW key for position bookkeeping.  Joining covered
    # positions back on the document id would MERGE the positions of all
    # rows sharing an id (duplicate-id inputs) and delete unrelated lines
    # by position in every copy; the document-frequency VOTE below still
    # counts distinct ids.  The SQL oracle keys per-row the same way
    # (ROW_NUMBER rid).  localCheckpoint pins the nondeterministic id
    # assignment so both the explode and the rebuild join read ONE value.
    lines_df = (
        df.select(
            F.col(id_col).alias("id"),
            F.when(
                F.length(F.coalesce(F.col(text_col), F.lit(""))) == 0,
                F.array().cast("array<string>"),
            )
            .otherwise(F.split(F.col(text_col), "\n"))
            .alias("lines"),
        )
        .withColumn("n_lines", F.size("lines"))
        .withColumn("__rid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
    )
    # NULL-id contract: a row without identity can neither vote in the
    # document-frequency count (countDistinct skips NULL anyway) nor have
    # lines removed — it passes through UNCHANGED (the rebuild join below
    # never matches a NULL key, so filtering here keeps both passes and
    # the SQL oracle on one rule)
    exploded = (
        lines_df.filter(F.col("id").isNotNull())
        .select("id", "__rid", F.posexplode("lines").alias("pos", "line"))
        .select(
            "id",
            "__rid",
            "pos",
            F.xxhash64(_norm_line(F.col("line"))).alias("h"),
            (F.length(_norm_line(F.col("line"))) == 0).alias("is_blank"),
        )
        .filter(~F.col("is_blank"))
        .drop("is_blank")
        .localCheckpoint(eager=False)
    )
    boilerplate = (
        exploded.groupBy("h")
        .agg(F.countDistinct("id").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("h")
    )
    covered = (
        exploded.join(boilerplate, "h").select("__rid", "pos").distinct()
    )
    return lines_df, covered


def line_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate-line statistics.

    Returns (id, n_lines, n_dup_lines, dup_line_ratio): n_dup_lines is
    the number of line positions whose normalized form appears in >=
    min_docs distinct documents corpus-wide; dup_line_ratio =
    n_dup_lines / n_lines (0.0 for empty documents).
    """
    lines_df, covered = _lines_view(df, id_col, text_col, min_docs)
    per_doc = covered.groupBy("__rid").agg(F.count("*").alias("n_dup_lines"))
    return (
        lines_df.select("id", "__rid", "n_lines")
        .join(per_doc, "__rid", "left")
        .select(
            "id",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.coalesce(F.col("n_dup_lines"), F.lit(0))
            .cast("long")
            .alias("n_dup_lines"),
            F.when(F.col("n_lines") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("n_dup_lines"), F.lit(0))
                    / F.col("n_lines"),
                    6,
                )
            )
            .alias("dup_line_ratio"),
        )
    )


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
) -> DataFrame:
    """Rewrite each document with its cross-document boilerplate lines
    DELETED — the action RefinedWeb/MassiveText take: every line whose
    normalized form appears in >= min_docs distinct documents is dropped
    (all copies), the survivors are re-joined with single newlines in
    their original order and original bytes.

    Returns (id, n_lines, n_removed, text_clean).  A document that was
    pure boilerplate becomes the empty string (downstream length filters
    then drop it).  Same plan as line_dedup_stats plus one per-doc
    covered-positions aggregation; the rewrite is a map-side array
    gather, O(lines + hits) per document.
    """
    lines_df, covered = _lines_view(df, id_col, text_col, min_docs)
    cov = covered.groupBy("__rid").agg(
        F.sort_array(F.collect_list("pos")).alias("cov")
    )
    joined = lines_df.join(cov, "__rid", "left").withColumn(
        "cov", F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    )
    # set-subtract covered positions from the position range, then gather
    # original lines — sequence() DESCENDS for empty docs, hence the guard
    kept_pos = F.when(
        F.col("n_lines") > 0,
        F.array_except(
            F.sequence(F.lit(0), F.col("n_lines") - 1), F.col("cov")
        ),
    ).otherwise(F.array().cast("array<int>"))
    kept = F.transform(kept_pos, lambda i: F.get("lines", i))
    return joined.select(
        "id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.size("cov").cast("long").alias("n_removed"),
        F.concat_ws("\n", kept).alias("text_clean"),
    )
