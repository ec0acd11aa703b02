"""BM25 keyword search over a document corpus — pure Catalyst.

Classic Okapi BM25 (Robertson & Zaragoza 2009) with Lucene's
non-negative idf = ln(1 + (N - df + 0.5)/(df + 0.5)):

  score(d, Q) = Σ_{t∈Q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Plan shape (all JVM-side, no UDFs):
  1. tokenize + explode, filter to the query terms — the IN-list predicate
     on a handful of terms prunes the exploded stream map-side, so the
     shuffle after it carries only matching (doc, term) rows;
  2. groupBy(doc, term) → tf, groupBy(term) → df: two shuffles on tiny
     post-filter data;
  3. N and avgdl come from a 1-row aggregate cross-joined in (broadcast
     nested loop of a single row — no collect, stays one lazy plan).

At corpus scale the dominant cost is the tokenize+explode scan — same
as any inverted-index build; everything downstream of the term filter is
proportional to hit count, not corpus size.  Determinism: scores are
rounded to 6dp and ranked by (score, doc_id), so the top-k cut is exact
and engine-portable (the DuckDB oracle replays the identical formula).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bloomfilter_spark.functions.textstats import token_count, tokens


def _score_tf(tf: DataFrame, stats: DataFrame, k1: float, b: float, topk: int) -> DataFrame:
    """Shared BM25 scoring tail: (doc_id, dl, term, tf) + 1-row corpus
    stats -> rounded-score top-k.  Both the scan path and the indexed
    path end here, so their answers are identical by construction."""
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hit_terms"),
            F.round(F.sum("contrib"), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(topk)
    )


def write_inverted_index(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
) -> None:
    """Materialize the inverted index, PARTITIONED BY term-hash bucket.

    Index rows: (term, doc_id, tf, dl, bucket = pmod(xxhash64(term), n)).
    A query's terms map to a handful of buckets, so search reads an
    ~len(terms)/n_buckets fraction of the files — genuine partition
    pruning, the same scale story as the IVF index (ann.py).  Corpus
    stats (n_docs, avgdl) are written as a 1-row sidecar at
    `<path>__stats` — BM25 needs them and a search must not re-scan the
    corpus to get them.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("toks"),
        token_count(F.col(text_col)).alias("dl"),
    )
    # n_buckets rides in the sidecar: a probe with a different modulus
    # would silently prune matching terms' buckets away
    toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).withColumn("n_buckets", F.lit(n_buckets)).write.mode(
        "overwrite"
    ).parquet(f"{path}__stats")
    (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def bm25_search_indexed(
    spark,
    path: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
    n_buckets: int | None = None,
) -> DataFrame:
    """BM25 top-k over a materialized inverted index — no corpus scan.

    Same scoring and output contract as bm25_search; reads only the
    query terms' buckets (partition pruning on the bucket column, then a
    term IN-list rowgroup filter inside them).

    n_buckets defaults to the value the index was written with (recorded
    in the stats sidecar); passing a DIFFERENT value is a hard error —
    the wrong modulus routes terms to buckets the index never wrote,
    silently dropping matching documents.
    """
    if not terms:
        raise ValueError("bm25_search_indexed needs at least one query term")
    terms = [t.lower() for t in terms]
    stats = spark.read.parquet(f"{path}__stats")
    recorded = None
    if "n_buckets" in stats.columns:
        recorded = int(stats.select("n_buckets").first()["n_buckets"])
        stats = stats.drop("n_buckets")
    if n_buckets is None:
        if recorded is None:
            raise ValueError(
                f"{path}__stats records no n_buckets (pre-sidecar index): "
                "pass n_buckets explicitly, matching the write"
            )
        n_buckets = recorded
    elif recorded is not None and n_buckets != recorded:
        raise ValueError(
            f"index at {path} was written with n_buckets={recorded}, "
            f"got n_buckets={n_buckets}: probes would prune wrong buckets"
        )
    buckets = sorted(
        {r.bucket for r in
         spark.createDataFrame([(t,) for t in terms], "term string")
         .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("bucket"))
         .collect()}
    )
    tf = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    return _score_tf(tf, stats, k1, b, topk)


def hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    terms: list[str],
    query_vectors,
    topk_recall: int = 50,
    topk: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval: BM25 keyword recall → exact cosine rerank —
    the standard hybrid-search topology (lexical candidates, dense
    rerank).

    Stage 1 scans/posting-filters the corpus for `topk_recall` BM25
    candidates (a driver-tiny set by construction).  Stage 2 semi-joins
    the embedding table down to those candidates — broadcast, no
    shuffle of the embedding side — and reranks with `brute_topk`'s GEMM.
    Returns (doc_id, rank, sim, bm25): rank by cosine, tie by id.

    `query_vectors`: pandas (qid, vector) like brute_topk; pass one row
    for classic single-query search.
    """
    from pyspark.sql import Window

    from bloomfilter_spark.operators.ann import brute_topk

    # materialize the tiny candidate set ONCE — it feeds two joins, and
    # without this each would re-run the whole BM25 corpus scan
    cands = bm25_search(
        docs, id_col, text_col, terms, topk=topk_recall
    ).localCheckpoint(eager=False)
    # reserved alias: an unqualified doc_id would be AMBIGUOUS_REFERENCE
    # whenever the embedding table's own id column is also named doc_id
    cand_ids = cands.select(F.col("doc_id").alias("__cand_id"))
    cand_emb = emb.join(
        F.broadcast(cand_ids),
        emb[emb_id_col] == F.col("__cand_id"),
        "left_semi",
    )
    # score ALL candidates, then cut on the ROUNDED cosine (engine-portable
    # rank rule, like every other top-k in the library) with an id tiebreak
    scored = brute_topk(
        cand_emb, query_vectors, k=topk_recall, id_col=emb_id_col,
        vec_col=vec_col,
    ).drop("rank")
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    reranked = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= topk
    )
    return (
        reranked.join(
            F.broadcast(cands), reranked["vec_id"] == cands["doc_id"]
        )
        .select(
            "doc_id", "qid", "rank", "sim", F.col("score").alias("bm25")
        )
        .orderBy("qid", "rank")
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """Top-k documents for a bag-of-words query.

    Returns (doc_id, n_hit_terms, score) — score rounded to 6dp, ranked
    by (score DESC, doc_id ASC), exactly `topk` rows (fewer if fewer
    docs match any term).  Tokenization is the library-wide rule:
    lowercase, trim, whitespace split.
    """
    if not terms:
        raise ValueError("bm25_search needs at least one query term")
    terms = [t.lower() for t in terms]
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("toks"),
        token_count(F.col(text_col)).alias("dl"),
    )
    # one-row corpus stats; broadcast into the scoring plan (no collect)
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    return _score_tf(tf, stats, k1, b, topk)
