"""Similarity search over embedding columns (array<float>).

- `brute_topk`: exact cosine top-k — broadcast the (small) query matrix,
  one numpy GEMM per Arrow batch on the executors, per-partition local
  top-k, then a global top-k window.  The per-partition pre-truncation
  means the shuffle carries k rows per (query, partition), not the whole
  table — the distributed top-k idiom that survives a 100 TB scan.
- `neardup_pairs`: all pairs with cosine ≥ threshold.  Fixture-scale
  implementation broadcasts the normalized matrix and scores each
  partition's rows against it (O(N²) work but O(N/P) memory per task);
  the 100 TB path is `ivf_assign` + within-bucket pairing (documented, and
  the bucketed variant is what `ivf_topk` demonstrates).
- `ivf_topk`: IVF-style ANN — deterministic k-means (numpy, fixed init on
  a driver sample), bucket assignment as a column, query probes only the
  `nprobe` nearest buckets.  Same output schema as brute_topk; recall is
  pytest-checked against the brute-force baseline.

All math float64 numpy; sims rounded to 4dp in outputs so results are
stable across summation orders (and hash-comparable against the DuckDB
oracle's double arithmetic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _emb_matrix(pdf: pd.DataFrame, col: str) -> np.ndarray:
    return np.vstack(pdf[col].to_numpy())


def brute_topk(
    emb: DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query row of `queries` (qid, vector).

    Output: (qid, rank, vec_id, sim) — rank 1..k, ties broken by vec_id.
    """
    spark = emb.sparkSession
    qids = queries["qid"].to_numpy()
    qm = _normalize(np.vstack(queries["vector"].to_numpy()))
    bc = spark.sparkContext.broadcast((qids, qm))

    def score_iter(batches):
        qids_, qm_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _normalize(_emb_matrix(pdf, vec_col))
            sims = qm_ @ vm.T  # (Q, B)
            ids = pdf[id_col].to_numpy()
            kk = min(k, sims.shape[1])
            # local top-k per query with the SAME tie-break as the global
            # window (sim desc, vec_id asc): argpartition on sim alone could
            # drop the smaller-id candidate of an exact tie at the k
            # boundary, diverging from the oracle's deterministic ordering
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qids_)):
                idx = np.lexsort((ids, -sims[qi]))[:kk]
                out_q.extend([qids_[qi]] * len(idx))
                out_id.extend(ids[idx])
                out_s.extend(sims[qi, idx])
            yield pd.DataFrame(
                {"qid": out_q, "vec_id": out_id, "sim": out_s}
            )

    local = emb.select(id_col, vec_col).mapInPandas(
        score_iter, schema="qid long, vec_id long, sim double"
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", F.round("sim", 4).alias("sim"))
    )


def neardup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine ≥ threshold.

    Broadcasts the normalized matrix (fixture scale); each task scores only
    its partition's rows against it.  Scale path: ivf_assign buckets +
    within-bucket pairs (trades recall for the O(N²) term)."""
    spark = emb.sparkSession
    pdf_all = emb.select(id_col, vec_col).toPandas()
    ids_all = pdf_all[id_col].to_numpy()
    m_all = _normalize(_emb_matrix(pdf_all, vec_col))
    bc = spark.sparkContext.broadcast((ids_all, m_all))

    def pair_iter(batches):
        ids_, m_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _normalize(_emb_matrix(pdf, vec_col))
            ids = pdf[id_col].to_numpy()
            sims = vm @ m_.T  # (B, N)
            bi, nj = np.nonzero(sims >= threshold)
            keep = ids[bi] < ids_[nj]
            yield pd.DataFrame(
                {
                    "id_a": ids[bi][keep],
                    "id_b": ids_[nj][keep],
                    "sim": sims[bi, nj][keep],
                }
            )

    return (
        emb.select(id_col, vec_col)
        .mapInPandas(pair_iter, schema="id_a long, id_b long, sim double")
        .select("id_a", "id_b", F.round("sim", 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# IVF (bucketed) ANN — the scale path
# ---------------------------------------------------------------------------


def train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample.

    Sample = lowest `sample` ids (deterministic, no RNG); init = every
    (len/n_centroids)-th sorted sample row; 5 Lloyd iterations in numpy.
    At real scale you'd sample per-partition and still fit centroids
    driver-side — centroid count is tiny."""
    pdf = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .toPandas()
    )
    m = _normalize(_emb_matrix(pdf, vec_col))
    step = max(1, len(m) // n_centroids)
    cents = m[::step][:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds `bucket` = argmax-centroid per row (numpy GEMM per batch)."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    cols = emb.columns

    def assign_iter(batches):
        cents = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _normalize(_emb_matrix(pdf, vec_col))
            pdf = pdf.copy()
            pdf["bucket"] = np.argmax(vm @ cents.T, axis=1).astype(np.int64)
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(emb.schema.fields) + [T.StructField("bucket", T.LongType())]
    )
    return emb.mapInPandas(assign_iter, schema=schema)


def ivf_topk(
    emb: DataFrame,
    queries: pd.DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """ANN top-k probing only the nprobe nearest buckets per query.

    Partition pruning analog: with the table written bucketed/partitioned
    by `bucket`, the filter below prunes file groups at the scan."""
    if centroids is None:
        centroids = train_centroids(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    qids = queries["qid"].to_numpy()
    qm = _normalize(np.vstack(queries["vector"].to_numpy()))
    probe_buckets = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    wanted = sorted({int(b) for row in probe_buckets for b in row})
    # ONE job: scan only the union of probed buckets (with the table
    # written partitioned by bucket this is partition pruning at the
    # source), score every query against its own buckets via a mask —
    # not a per-query job loop.
    pruned = assigned.filter(F.col("bucket").isin(wanted))
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((qids, qm, probe_buckets))

    def score_iter(batches):
        qids_, qm_, pb_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vm = _normalize(_emb_matrix(pdf, vec_col))
            sims = qm_ @ vm.T  # (Q, B)
            ids = pdf[id_col].to_numpy()
            buckets = pdf["bucket"].to_numpy()
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qids_)):
                mask = np.isin(buckets, pb_[qi])
                if not mask.any():
                    continue
                s = sims[qi][mask]
                idx = np.lexsort((ids[mask], -s))[: min(k, len(s))]
                out_q.extend([qids_[qi]] * len(idx))
                out_id.extend(ids[mask][idx])
                out_s.extend(s[idx])
            if out_q:
                yield pd.DataFrame(
                    {"qid": out_q, "vec_id": out_id, "sim": out_s}
                )

    local = pruned.select(id_col, vec_col, "bucket").mapInPandas(
        score_iter, schema="qid long, vec_id long, sim double"
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", F.round("sim", 4).alias("sim"))
    )
