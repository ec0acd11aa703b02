"""Crawl-snapshot diff — incremental corpus processing.

Between two crawls of the same key space, a pipeline wants exactly four
sets: added, removed, changed, unchanged.  One full-outer join on the
key with an md5 content fingerprint comparison gives all four in a
single shuffle — the CDC primitive for "process only what changed"
(re-embed changed docs, evict removed ones from the dedup index, etc.).

The content hash is md5 of the concatenated content columns (the
library's cross-engine hash rule), computed BEFORE the join so the
shuffle carries a 32-char digest instead of the document body — at crawl
scale the join payload is keys + hashes, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: list[str] | str,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns (key_col, status) with status ∈ added | removed | changed |
    unchanged.  Rows must be unique per key in each snapshot (a crawl
    keyed by canonical URL is).  NULL content columns hash as the empty
    string (coalesce), so NULL vs '' is 'unchanged' — document-level
    nullability is not content change.  NULL keys carry no identity to
    match across snapshots (SQL full-outer join never pairs them): a
    NULL-keyed row in each snapshot yields one 'removed' + one 'added'
    row, the library-wide null-key rule.
    """
    cols = [content_cols] if isinstance(content_cols, str) else list(content_cols)
    if not cols:
        # concat_ws over zero columns is the constant '' — every key
        # present in both snapshots would silently report 'unchanged'
        raise ValueError("snapshot_diff needs at least one content column")

    def fp(df: DataFrame, out: str) -> DataFrame:
        # length-prefixed concat: injective even when values contain the
        # separator (('a\x1fb','c') vs ('a','b\x1fc') must NOT collide)
        parts = []
        for c in cols:
            v = F.coalesce(F.col(c).cast("string"), F.lit(""))
            parts.append(F.concat(F.length(v).cast("string"), F.lit(":"), v))
        h = F.md5(F.concat_ws("\x1f", *parts))
        return df.select(F.col(key_col).alias("k"), h.alias(out))

    o = fp(old, "h_old")
    n = fp(new, "h_new")
    joined = o.join(n, "k", "full_outer")
    return joined.select(
        F.col("k").alias(key_col),
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
