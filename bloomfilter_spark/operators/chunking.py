"""Document chunking — the RAG/embedding-pipeline shape: split each
document into overlapping fixed-token windows, keeping provenance
(doc id, chunk index) so chunk vectors join back to sources.

Map-only Catalyst: tokenize → window starts via a stepped sequence() →
slice + re-join per window → posexplode.  No shuffle, no Python; the
chunk table inherits the scan's partitioning, which is exactly what the
downstream embedding UDF wants (one Arrow batch per task, no skew
introduced).  Cross-engine exact: the same windows fall out of DuckDB's
range()/list_slice, so the catalog oracle value-checks every chunk
string.

Reference analog: none (text-pipeline surface from the driver brief);
tokenization is the library-wide rule (textstats.tokens_nonempty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bloomfilter_spark.functions.textstats import tokens_nonempty


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per chunk: (id, chunk_idx, n_chunk_tokens, chunk_text).

    Windows start every `chunk_tokens - overlap` tokens, with starts
    capped at `n_tokens - overlap` so no chunk is fully contained in its
    predecessor (a start beyond that cap would re-emit tokens an earlier
    window already covered — wasted embeddings, duplicate retrieval
    hits).  Every token is covered; the final window may be shorter.
    Empty/NULL documents produce no chunks.  chunk_idx is 0-based and
    dense per document.

    chunk_text is NORMALIZED, not original bytes: the library-wide
    tokenizer lowercases and collapses whitespace, and chunks re-join
    tokens with single spaces.  Pipelines that must display or
    byte-match chunks against the source should re-slice the original
    text by the (chunk_idx, chunk_tokens, overlap) provenance instead of
    using chunk_text verbatim (contrast: linededup preserves original
    bytes because its product IS the cleaned document).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    step = chunk_tokens - overlap
    toks = tokens_nonempty(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    # guard: sequence() DESCENDS for stop < start without this.  Stop at
    # n - overlap: the previous window already reached the end beyond it
    starts = F.when(
        F.size("__toks") > 0,
        F.sequence(
            F.lit(1),
            F.greatest(F.lit(1), F.size("__toks") - overlap),
            F.lit(step),
        ),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts, lambda s: F.slice("__toks", s, chunk_tokens)
    )
    return (
        base.select("id", F.posexplode(chunks).alias("chunk_idx", "__c"))
        .select(
            "id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("__c").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", "__c").alias("chunk_text"),
        )
    )
