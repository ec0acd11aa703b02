"""Hashed TF-IDF document vectors — the text→feature bridge.

The hashing-trick featurizer (HashingTF shape): term → dimension by
hash, weight = tf · idf (smooth: ln((N+1)/(df+1)) + 1), colliding terms
sum, then the doc vector is L2-normalized.  Output is long format
(doc_id, dim, w) — the natural shuffle-friendly layout, and what the
cosine/ANN operators consume after a pivot.

Cross-engine determinism: the dimension hash is the library's md5 rule
(conv(substring(md5(term),1,15),16,10) mod d — the only hash Spark and
DuckDB share), so the oracle replays the whole pipeline value-for-value;
weights round to 6dp, absorbing float-sum order.

Plan: explode → two aggregations (tf per doc-term, df per term) + a
1-row count broadcast — same topology as BM25, everything JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F



def _dim_of(term, d: int):
    return F.pmod(
        F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long"), F.lit(d)
    )


def tfidf_vectors(
    df: DataFrame, id_col: str, text_col: str, dim: int = 256
) -> DataFrame:
    """L2-normalized hashed TF-IDF vectors, long format (doc_id, dim, w).

    Documents with no tokens produce no rows.  w is rounded to 6dp.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    from bloomfilter_spark.functions.textstats import tokens_nonempty

    # the library-wide filtered tokenizer — one pinned rule, not a copy
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_nonempty(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    weighted = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            _dim_of(F.col("term"), dim).alias("dim"),
            (
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                )
            ).alias("w"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("w").alias("w"))
    )
    from pyspark.sql import Window

    norm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("doc_id")))
    return weighted.select(
        "doc_id", "dim", F.round(F.col("w") / norm, 6).alias("w")
    )
