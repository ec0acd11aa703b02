"""Similarity search over embedding columns (array<float>).

- `brute_topk`: exact cosine top-k — broadcast the (small) query matrix,
  one numpy GEMM per Arrow batch on the executors, per-partition local
  top-k, then a global top-k window.  The per-partition pre-truncation
  means the shuffle carries k rows per (query, partition), not the whole
  table — the distributed top-k idiom that survives a 100 TB scan.
- `neardup_pairs`: all pairs with cosine ≥ threshold — exact, via the
  block-pair cogroup plan (hash rows into blocks, one GEMM task per block
  pair): no driver collect, no full-matrix broadcast, bounded task memory.
  The sub-quadratic approximate path at corpus scale is LSH
  (operators/dedup.py) or `ivf_assign` bucketing.
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


def _nonnull_emb(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Library-wide null policy for embedding operators: rows with a NULL
    id, NULL vector, or empty vector carry nothing to score — drop them
    Catalyst-side (np.vstack over a column holding None would otherwise
    crash the executor)."""
    return emb.filter(
        F.col(id_col).isNotNull()
        & F.col(vec_col).isNotNull()
        & (F.size(vec_col) > 0)
    )


def _local_topk(s: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Top-kk indices by (sim desc, id asc) — O(B) argpartition, then a
    lexsort over only the candidates at/above the kk-th sim (so boundary
    ties are broken identically to the global window/oracle ordering,
    without the full-batch O(B log B) sort)."""
    if kk >= len(s):
        return np.lexsort((ids, -s))[:kk]
    part = np.argpartition(-s, kk - 1)[:kk]
    thresh = s[part].min()
    cand = np.nonzero(s >= thresh)[0]
    order = np.lexsort((ids[cand], -s[cand]))[:kk]
    return cand[order]


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
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qids_)):
                idx = _local_topk(sims[qi], ids, kk)
                out_q.extend([qids_[qi]] * len(idx))
                out_id.extend(ids[idx])
                out_s.extend(sims[qi, idx])
            yield pd.DataFrame(
                {"qid": out_q, "vec_id": out_id, "sim": out_s}
            )

    local = _nonnull_emb(emb, id_col, vec_col).select(id_col, vec_col).mapInPandas(
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
    n_blocks: int | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine ≥ threshold — EXACT, distributed.

    Block-pair plan: rows hash into `n_blocks` blocks; every unordered
    block pair (bi ≤ bj) becomes one cogrouped task that GEMMs block bi
    against block bj and emits the over-threshold pairs.  Nothing collects
    to the driver and no full matrix is broadcast — the table is shuffled
    (replication factor n_blocks, one copy per block pair a row joins), and
    each task holds only two blocks of N/n_blocks rows.  The O(N²) *work*
    is inherent to an exact all-pairs score; this spreads it over
    n_blocks(n_blocks+1)/2 tasks with bounded memory.  n_blocks is the
    memory/replication knob: pick ≈ N·d·8 / (executor task memory) so two
    blocks fit, more tasks than cores.  For corpus-scale near-dup mining
    where approximate recall is acceptable, the sub-quadratic path is
    minhash/simhash LSH (operators/dedup.py) or ivf_assign bucketing."""
    spark = emb.sparkSession
    emb = _nonnull_emb(emb, id_col, vec_col)
    if n_blocks is None:
        n_blocks = max(4, min(64, spark.sparkContext.defaultParallelism // 2))
    pair_rows = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    # the right side carries only STRICT pairs (i < j): a diagonal group's
    # score() is a @ a.T over the left frame alone, so shipping the block
    # again as its own right side was one full redundant copy of the
    # table through the shuffle
    pair_rows_strict = [(i, j) for i in range(n_blocks) for j in range(i + 1, n_blocks)]
    block_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks))
    # the two sides get fully distinct column names (and separate tiny
    # block-pair relations) so Spark's ambiguous-self-join analyzer can
    # resolve the cogroup; each row fans out to exactly n_blocks groups
    e_a = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        block_of.alias("block"),
    )
    e_b = emb.select(
        F.col(id_col).alias("id_r"),
        F.col(vec_col).alias("vec_r"),
        block_of.alias("block_r"),
    )
    pairs_a = spark.createDataFrame(pair_rows, "bi long, bj long")
    pairs_b = spark.createDataFrame(pair_rows_strict, "bi_r long, bj_r long")
    side_a = F.broadcast(pairs_a).join(e_a, F.col("bi") == F.col("block"))
    side_b = F.broadcast(pairs_b).join(e_b, F.col("bj_r") == F.col("block_r"))

    def score(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        if len(l) == 0:
            return empty
        ids_a = l["id"].to_numpy()
        a = _normalize(_emb_matrix(l, "vec"))
        # diagonal groups have NO right side (pairs_b is strict) — check
        # the diagonal branch before the r-empty early-out
        if int(l["bi"].iloc[0]) == int(l["bj"].iloc[0]):
            sims = a @ a.T
            ii, jj = np.nonzero(sims >= threshold)
            keep = ids_a[ii] < ids_a[jj]
            return pd.DataFrame(
                {
                    "id_a": ids_a[ii][keep],
                    "id_b": ids_a[jj][keep],
                    "sim": sims[ii, jj][keep],
                }
            )
        if len(r) == 0:
            return empty
        ids_b = r["id_r"].to_numpy()
        b = _normalize(_emb_matrix(r, "vec_r"))
        sims = a @ b.T
        ii, jj = np.nonzero(sims >= threshold)
        ia, ib = ids_a[ii], ids_b[jj]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "sim": sims[ii, jj],
            }
        )

    return (
        side_a.groupby("bi", "bj")
        .cogroup(side_b.groupby("bi_r", "bj_r"))
        .applyInPandas(score, schema="id_a long, id_b long, sim double")
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
        _nonnull_emb(emb, id_col, vec_col)
        .select(id_col, vec_col)
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
    """Adds `bucket` = argmax-centroid per row (numpy GEMM per batch).
    Null/empty-embedding rows are dropped (no bucket can hold them)."""
    spark = emb.sparkSession
    emb = _nonnull_emb(emb, id_col, vec_col)
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

    Partition pruning analog: with the table written partitioned by
    `bucket` (see write_ivf_index / ivf_topk_indexed), the same filter
    prunes whole directories at the scan."""
    if centroids is None:
        centroids = train_centroids(emb, n_centroids, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    return _score_probed_buckets(
        assigned, queries, centroids, k, nprobe, id_col, vec_col
    )


def write_ivf_index(
    emb: DataFrame,
    centroids: np.ndarray,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: the table written PARTITIONED BY bucket.

    This turns the probe-time bucket filter into genuine partition pruning
    — at 100 TB an nprobe/n_centroids fraction of the files is read, the
    rest never leave storage."""
    assigned = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(path)


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: pd.DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a materialized IVF index: the bucket filter is pushed to
    the partitioned scan (PartitionFilters in the plan — directories for
    unprobed buckets are never listed into the read)."""
    assigned = spark.read.parquet(index_path)
    return _score_probed_buckets(
        assigned, queries, centroids, k, nprobe, id_col, vec_col
    )


def _score_probed_buckets(
    assigned: DataFrame,
    queries: pd.DataFrame,
    centroids: np.ndarray,
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    qids = queries["qid"].to_numpy()
    qm = _normalize(np.vstack(queries["vector"].to_numpy()))
    probe_buckets = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]
    wanted = sorted({int(b) for row in probe_buckets for b in row})
    # ONE job: scan only the union of probed buckets (partition pruning
    # when the table is written partitioned by bucket), score every query
    # against its own buckets via a mask — not a per-query job loop.
    pruned = assigned.filter(F.col("bucket").isin(wanted))
    spark = assigned.sparkSession
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
                idx = _local_topk(s, ids[mask], min(k, len(s)))
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


# ---------------------------------------------------------------------------
# SRP (signed-random-projection / hyperplane) LSH — the sub-quadratic
# embedding near-dup path
# ---------------------------------------------------------------------------


def _srp_projection(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic (dim, n_bits) Gaussian hyperplane matrix.

    No RNG object (same policy as train_centroids): entries come from
    murmur3 over the flat entry index — two u64 lanes per entry → two
    uniforms in (0,1) → one Box-Muller normal.  Any executor, any numpy
    version, any call order reproduces the same hyperplanes bit-for-bit,
    so signatures computed in different Arrow batches / partitions are
    comparable by construction."""
    from bloomfilter_spark.functions.hashing import murmur3_x64_128_u64

    idx = np.arange(dim * n_bits, dtype=np.int64)
    h1, h2 = murmur3_x64_128_u64(idx, seed=seed)
    # (h + 0.5) / 2^64: strictly inside (0, 1) so log() is finite
    u1 = (h1.astype(np.float64) + 0.5) * (2.0**-64)
    u2 = (h2.astype(np.float64) + 0.5) * (2.0**-64)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return z.reshape(dim, n_bits)


def srp_signatures(
    emb: DataFrame,
    n_bits: int = 512,
    bands: int = 32,
    seed: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sig array<long>[bands]) — hyperplane sign-bit LSH signatures
    (Charikar, STOC 2002: P[sign agree] = 1 − θ/π for angle θ).

    sig[j] packs band j's r = n_bits/bands sign bits into one integer, so
    the relation feeding the candidate self-join carries `bands` longs per
    row regardless of n_bits — at 10^12 rows the shuffle width is the
    band values, never the raw vectors.  One executor-side GEMM per Arrow
    batch (X @ P, then a reshape-matmul bit-pack); the projection matrix is
    rebuilt deterministically per task from the seed (dim·n_bits doubles,
    ~128 KB at dim 64 — cheaper than a broadcast round-trip).

    Null-id / null-or-empty-vector rows are dropped (library-wide null
    policy: rows that can never match under equality semantics never enter
    the operator)."""
    from bloomfilter_spark.functions.hashing import DEFAULT_SEED
    from bloomfilter_spark.plans.skew import ensure_parallelism

    if n_bits % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide n_bits ({n_bits}) evenly"
        )
    r = n_bits // bands
    if r > 62:
        raise ValueError(f"rows per band {r} overflows a signed 64-bit pack")
    s = DEFAULT_SEED if seed is None else seed
    weights = np.int64(1) << np.arange(r, dtype=np.int64)

    def sig_iter(batches):
        proj = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _emb_matrix(pdf, vec_col).astype(np.float64)
            if proj is None or proj.shape[0] != x.shape[1]:
                proj = _srp_projection(x.shape[1], n_bits, s)
            signs = (x @ proj) >= 0.0  # (n, n_bits)
            # integer bit-pack (einsum over int64): exact for any r ≤ 62.
            # A float64 dot product would round partial sums past r = 53
            # bits, making the packed value depend on accumulation order —
            # signatures must be bit-identical across batch shapes.
            vals = np.einsum(
                "nbr,r->nb",
                signs.reshape(len(x), bands, r).astype(np.int64),
                weights,
            )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "sig": list(vals),
                }
            )

    clean = emb.select(id_col, vec_col).filter(
        F.col(id_col).isNotNull()
        & F.col(vec_col).isNotNull()
        & (F.size(vec_col) > 0)
    )
    return ensure_parallelism(clean).mapInPandas(
        sig_iter, schema="id long, sig array<long>"
    )


def neardup_srp_verified(
    emb: DataFrame,
    threshold: float,
    n_bits: int = 512,
    bands: int = 32,
    seed: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sub-quadratic near-dup pairs over an embedding column with EXACT
    cosine output — the dense-vector analog of minhash_dedup_pairs_verified.

    SRP-LSH candidate generation (pairs sharing ≥1 of `bands` sign-bit
    bands; the same banded self-equijoin as MinHash LSH) followed by exact
    cosine verification on the colliding pairs — the joins stay Catalyst;
    the per-pair math is one Arrow-batched numpy einsum (a Catalyst
    zip_with/aggregate version measured ~3.7× slower at 200k pairs:
    higher-order-function lambdas evaluate interpreted per ELEMENT, and
    the verify set is pairs × dim elements).  A true pair at cosine s
    escapes candidacy with probability (1 − p^r)^b, p = 1 − arccos(s)/π:
    ~1e-9 at the ~0.99 cosine of real near-duplicates with the default
    32×16-bit bands (a pair sitting exactly AT a 0.9 threshold escapes
    with ~6% — when boundary pairs must be exact too, size with
    `srp_geometry`), which is what lets this path carry a full SQL value
    oracle while staying sub-quadratic — the block-pair `neardup_pairs`
    plan scores O(N²/B) GEMM cells, this one scores only colliding
    pairs.

    GEOMETRY MATTERS: random collisions run ~n²/2^r per band, so r (bits
    per band = n_bits/bands) sets the candidate rate and b = bands sets
    the recall.  The 32×16 default holds both at the high-similarity
    near-dup operating point; 4-bit bands (the low-threshold end of the
    recall curve) at n = 20k already generate ~10⁹ candidates — measured,
    which is why the default is the selective geometry and low-threshold
    mining belongs to `neardup_pairs`.

    Zero-norm vectors define cosine 0 here (same contract as
    `_normalize`), so they can never reach a positive threshold."""
    sigs = srp_signatures(
        emb, n_bits=n_bits, bands=bands, seed=seed, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=False)
    from bloomfilter_spark.operators.dedup import lsh_candidate_pairs

    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=1)

    dvec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    sides = emb.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("id"), dvec.alias("v")
    )
    ea = sides.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    eb = sides.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))

    @F.pandas_udf("double")
    def _cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        a = np.vstack(va.to_numpy())
        b = np.vstack(vb.to_numpy())
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        out = np.zeros(len(num))  # zero-norm pairs: cosine defined as 0
        nz = den != 0
        out[nz] = num[nz] / den[nz]
        return pd.Series(out)

    return (
        cands.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("sim_raw", _cosine("v_a", "v_b"))
        .filter(F.col("sim_raw") >= threshold)  # unrounded, like the oracle
        .select("id_a", "id_b", F.round("sim_raw", 4).alias("sim"))
    )


def srp_geometry(
    threshold: float,
    target_recall: float = 1 - 1e-6,
    max_bits: int = 4096,
) -> tuple[int, int]:
    """(n_bits, bands) sized so a true pair AT `threshold` cosine escapes
    candidacy with probability ≤ 1 − target_recall.

    P[sign bits agree] = p = 1 − arccos(threshold)/π (Charikar); a band of
    r bits collides with p^r and b bands miss with (1 − p^r)^b.  Bigger r
    = fewer random candidates (n²/2^r per band), so this picks the LARGEST
    r whose required band count still fits `max_bits` — the selectivity-
    maximal geometry at the recall budget.  Raise max_bits at corpus
    scale: signature width is bands × 8 bytes per row, traded against the
    verify join's candidate volume.

    Note the distinction the defaults exploit: `neardup_srp_verified`'s
    32×16 default gives escape ~1e-9 for ~0.99-cosine near-dups but ~6%
    for a pair sitting exactly at a 0.9 threshold — when boundary pairs
    must also be exact, size with this helper."""
    import math

    if not (-1.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (-1, 1), got {threshold}")
    if not (0.0 < target_recall < 1.0):
        raise ValueError(
            f"target_recall must be in (0, 1), got {target_recall}"
        )
    p = 1.0 - math.acos(threshold) / math.pi
    if p <= 0.0:
        raise ValueError(f"threshold {threshold} gives zero agreement prob")
    log_miss = math.log(1.0 - target_recall)
    for r in range(62, 0, -1):
        pr = p**r
        if pr <= 0.0 or pr >= 1.0:
            continue
        b = math.ceil(log_miss / math.log(1.0 - pr))
        if b * r <= max_bits:
            return (b * r, b)
    raise ValueError(
        f"no geometry under {max_bits} bits reaches recall {target_recall} "
        f"at threshold {threshold} — raise max_bits"
    )
