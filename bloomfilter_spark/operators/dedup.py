"""Deduplication operators for web-scale training-data pipelines.

Three families, by exactness/scale trade-off:

- exact n-gram Jaccard (`ngram_jaccard_pairs`): pure Catalyst — shingle
  explode → shingle-equijoin candidate generation → intersection counts →
  Jaccard.  Exactly SQL-expressible (DuckDB oracle in queries.py).  At
  100 TB the shingle join is the bottleneck; that's what MinHash replaces.
- MinHash + LSH (`minhash_signatures`, `lsh_candidate_pairs`,
  `minhash_dedup_pairs`): vectorized numpy signatures (murmur3 shingle
  hashes × 2-universal permutations, segment-min via reduceat), banded LSH
  bucketing as a Spark groupBy — the standard sub-quadratic near-dup path.
  Probabilistic recall (tested on planted near-dups), so it gets a
  rows-only driver check, not a SQL oracle.
- SimHash (`simhash64`, `simhash_dedup_pairs`): 64-bit sign-sum sketch per
  doc; Hamming-distance candidate pairs via the generalized pigeonhole
  multi-index join (`hamming_pairs`: C(n_segments, n_segments-max_hamming)
  segment-combination keys — n_segments is the bucket-width scale knob),
  final distance check with JVM-side bit_count(xor).  `simhash_sql` /
  `simhash_dedup_pairs_sql` are the Catalyst-only md5 variants whose hash
  DuckDB recomputes bit-for-bit (the SQL-oracle path).

All per-doc heavy lifting is Arrow-batched numpy (no per-row Python,
BASELINE.json:15); candidate joins/buckets ride Catalyst shuffles so AQE
handles skewed buckets (a hot shingle/bucket is a skewed join key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from bloomfilter_spark.functions.hashing import (
    DEFAULT_SEED,
    bytes_view_of_strings,
    murmur3_x64_128,
)
from bloomfilter_spark.plans.skew import ensure_parallelism
from bloomfilter_spark.functions.textstats import WS_SPLIT_PATTERN

# 2-universal permutation parameters for MinHash: sig_j = min((a_j*h + b_j))
_MERSENNE61 = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    ids = np.arange(2 * num_perm, dtype=np.uint64)
    flat = ids.astype("<u8").view(np.uint8)
    offsets = np.arange(2 * num_perm + 1, dtype=np.int64) * 8
    h1, _ = murmur3_x64_128(flat, offsets, seed=seed)
    a = (h1[:num_perm] | np.uint64(1)) & _MERSENNE61  # odd, < 2^61
    b = h1[num_perm:] & _MERSENNE61
    return a, b


# ---------------------------------------------------------------------------
# Shingling (shared by exact + MinHash paths)
# ---------------------------------------------------------------------------


def shingles_col(text_col: str, n: int = 3):
    """Distinct word n-gram shingles as an array column — pure Catalyst.

    NOTE: `text_col` here should be a MATERIALIZED token-array column when
    used in a hot path — referencing split() directly makes the tokenizer
    re-evaluate under the transform lambda (no CSE through higher-order
    functions), measured ~1.4× slower.  Project the token array first and use shingles_of_toks for the hot
    path (as ngram_jaccard_pairs does); this wrapper stays for ad-hoc use."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT_PATTERN)
    return _shingles_of(toks, n)


def shingles_of_toks(toks_col: str, n: int = 3):
    """Shingles from an already-materialized token-array column."""
    return _shingles_of(F.col(toks_col), n)


def _shingles_of(toks, n: int):
    # ONE shingle rule library-wide (functions layer owns it; the
    # repetition features import it downward instead of reaching up here)
    from bloomfilter_spark.functions.textstats import distinct_shingles

    return distinct_shingles(toks, n)


def _tokenize_catalyst_rule(texts: pd.Series) -> pd.Series:
    """pandas replay of the library's pinned Catalyst tokenizer:
    lower → trim SPACES ONLY (F.trim / DuckDB trim) → split on the
    explicit RE2-compatible class WS_SPLIT_PATTERN, KEEPING empty edge
    tokens (Spark split limit=-1 / DuckDB string_split_regex both keep
    them).  Python str.split() must not be used here: it splits on \\x0b,
    \\xa0 and all Unicode whitespace and drops empties, so pandas-path
    shingles would diverge from every Catalyst path and SQL oracle on
    those bytes."""
    return (
        texts.fillna("")
        .str.lower()
        .str.strip(" ")
        .str.split(WS_SPLIT_PATTERN, regex=True)
    )


def _shingle_sets(texts: pd.Series, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(flat distinct shingle strings, offsets) per doc — pandas/numpy."""
    toks = _tokenize_catalyst_rule(texts)
    out_shingles: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, ts in enumerate(toks):
        if ts is None or len(ts) < n:
            offsets[i + 1] = offsets[i]
            continue
        seen = dict.fromkeys(
            " ".join(ts[j : j + n]) for j in range(len(ts) - n + 1)
        )
        out_shingles.extend(seen)
        offsets[i + 1] = offsets[i] + len(seen)
    return np.array(out_shingles, dtype=object), offsets


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, sz, shingle) — one row per DISTINCT word n-gram per document,
    where sz = the doc's distinct-shingle count.

    Arrow-batched pandas shingler (`_shingle_sets`, the same pinned
    tokenize→shingle rule the minhash paths replay) instead of the
    Catalyst `transform(sequence, i -> concat_ws(slice(...)))` +
    `array_distinct` expression: higher-order functions evaluate
    interpreted per element with per-shingle object allocation, measured
    ~16x slower than this batch path at identical, oracle-pinned output
    (3.2 s vs 0.2 s for 5000 sf0.1 docs).  Emits nothing for docs with
    fewer than n tokens — identical to the old `size(sh) > 0` filter."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id", df.schema[id_col].dataType),
            StructField("sz", LongType()),
            StructField("shingle", StringType()),
        ]
    )
    src = ensure_parallelism(df).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )

    def gen(batches):
        for pdf in batches:
            flat, offsets = _shingle_sets(pdf["text"], n)
            cnt = np.diff(offsets)
            idx = np.repeat(np.arange(len(pdf)), cnt)
            yield pd.DataFrame(
                {
                    # .iloc keeps the id column's (possibly nullable)
                    # dtype intact instead of collapsing NULLs to NaN
                    "id": pdf["id"].iloc[idx].reset_index(drop=True),
                    "sz": cnt[idx],
                    "shingle": flat,
                }
            )

    return src.mapInPandas(gen, out_schema)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (Catalyst; the DuckDB-oracle-checked dedup path)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold.

    Candidate generation = equi-join on shingle (only pairs sharing ≥1
    shingle are scored — exact, since J>0 requires a shared shingle).
    Columns: id_a, id_b (id_a < id_b), jaccard (rounded 6dp).

    max_doc_freq (opt-in, CCNet/Gopher stop-shingle practice): drop
    shingles appearing in more than this many documents BEFORE the
    self-join.  A single boilerplate shingle shared by 1M docs otherwise
    creates ~5·10^11 candidate rows that no AQE skew-split can shrink —
    the cap collapses that hot key's cross product entirely.  Semantics:
    Jaccard is computed over the FILTERED shingle universe (hot shingles
    are treated as stopwords on both the intersection and the set sizes),
    so scores change only for pairs that share a hot shingle; the default
    (None) keeps the exact all-shingle answer and the unchanged plan.
    """
    # join on the shingle's 64-bit hash, not the string: identical pair
    # counts w.h.p. (64-bit collisions ~1e-9 at millions of shingles) and
    # the shuffle carries 8 bytes per shingle instead of ~25.
    # localCheckpoint materializes the relation once — both self-join
    # branches read it, instead of recomputing scan+shingling per branch.
    ex = (
        exploded_shingles(df, id_col, text_col, n)
        .select("id", "sz", F.xxhash64("shingle").alias("s"))
        .localCheckpoint(eager=False)
    )
    if max_doc_freq is not None:
        # One extra groupBy recomputes set sizes over the filtered
        # universe — the price for collapsing the hot-key cross product
        # from O(df^2) to zero.  The hot set is usually tiny (shingles in
        # > cap docs), but its size is data-dependent — bounded only by
        # total_shingles/cap — so the broadcast hint is gated on an
        # actual count: a forced broadcast of a huge hot set would OOM
        # exactly in the boilerplate-heavy scenario this flag exists for.
        hot = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_doc_freq)
            .select("s")
            .localCheckpoint()  # count once, reuse for the join
        )
        if hot.count() <= 2_000_000:  # ~16 MB of 8-byte keys broadcast
            hot = F.broadcast(hot)
        kept = ex.join(hot, "s", "left_anti")
        sz2 = kept.groupBy("id").agg(F.count(F.lit(1)).alias("__sz"))
        ex = (
            kept.drop("sz")
            .join(sz2, "id")
            .select("id", F.col("__sz").alias("sz"), "s")
            .localCheckpoint(eager=False)
        )
    a = ex.select(
        F.col("id").alias("id_a"), F.col("sz").alias("sz_a"), F.col("s")
    )
    b = ex.select(
        F.col("id").alias("id_b"), F.col("sz").alias("sz_b"), F.col("s")
    )
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# Permutation-matrix memory cap: the (items × lanes) uint64 block is the
# fold's working set.  2^18 items × 128 lanes × 8 B = 256 MB peak — without
# the cap a 10k-row Arrow batch of multi-KB pages (~300 shingles each)
# would materialize a ~3 GB matrix per python worker and thrash.
_MINHASH_CHUNK_SHINGLES = 1 << 18
_SIMHASH_CHUNK_TOKENS = 1 << 19  # 512k tokens × 64 lanes × 8 B = 256 MB peak


def _chunked_doc_ranges(offsets: np.ndarray, cap: int):
    """Yield (doc_start, doc_end) ranges whose total item span ≤ cap.

    A single doc larger than cap gets its own range — callers must
    sub-block inside it (see _minhash_fold / simhash64) so the cap is a
    TRUE per-worker bound, not 'bounded unless one row is huge'."""
    n_docs = len(offsets) - 1
    start = 0
    while start < n_docs:
        end = start + 1
        while end < n_docs and offsets[end + 1] - offsets[start] <= cap:
            end += 1
        yield start, end
        start = end


def _minhash_fold(
    h: np.ndarray,
    offsets: np.ndarray,
    a_p: np.ndarray,
    b_p: np.ndarray,
    sink,
    cap: int | None = None,
) -> None:
    """Per-doc signature mins over doc chunks bounded by shingle count.

    sink(row_index, mins_uint64_row) is called once per non-empty doc;
    chunking (including the oversized-single-doc sub-blocks, combined
    with a running np.minimum) changes peak memory only — per-doc
    results are identical."""
    cap = _MINHASH_CHUNK_SHINGLES if cap is None else cap
    with np.errstate(over="ignore"):
        for start, end in _chunked_doc_ranges(offsets, cap):
            lo, hi = offsets[start], offsets[end]
            if hi <= lo:
                continue
            if end == start + 1 and hi - lo > cap:
                # one doc wider than the cap: running min over sub-blocks
                acc = None
                for blo in range(lo, hi, cap):
                    bhi = min(blo + cap, hi)
                    pm = (
                        h[blo:bhi, None] * a_p[None, :] + b_p[None, :]
                    ) & _MERSENNE61
                    m = pm.min(axis=0)
                    acc = m if acc is None else np.minimum(acc, m)
                sink(start, acc)
                continue
            pm = (h[lo:hi, None] * a_p[None, :] + b_p[None, :]) & _MERSENNE61
            seg = offsets[start:end]
            counts = offsets[start + 1 : end + 1] - seg
            nz = np.nonzero(counts > 0)[0]
            if len(nz):
                mins = np.minimum.reduceat(pm, seg[nz] - lo, axis=0)
                for row, m in zip(nz, mins):
                    sink(start + int(row), m)


def _id_out(df: DataFrame, id_col: str):
    """(spark DataType, pandas widener) for an id column that must survive
    the mapInPandas boundary with its ORIGINAL type: hardcoding `id long`
    breaks string-keyed corpora outright and NULL ids in int columns
    (float64+NaN cannot convert back to long) — the same contract
    exploded_shingles already keeps."""
    from pyspark.sql import types as T

    dt = df.schema[id_col].dataType
    is_int = isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )

    def widen(s: pd.Series) -> pd.Series:
        return s.astype("Int64") if is_int else s

    return dt, widen


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 128,
    n: int = 3,
    seed: int = DEFAULT_SEED,
    chunk_shingles: int | None = None,
) -> DataFrame:
    """(id, sig array<long>[num_perm]) — empty array when doc has no shingle.

    Per Arrow batch: murmur3 over all distinct shingles at once, then the
    num_perm 2-universal permutations as a broadcast multiply chunked to a
    bounded working set (_MINHASH_CHUNK_SHINGLES) and a per-doc segmented
    min (np.minimum.reduceat) — no per-row Python."""
    from pyspark.sql import types as T

    a_p, b_p = _perm_params(num_perm, seed)
    id_dt, widen = _id_out(df, id_col)
    out_schema = T.StructType(
        [
            T.StructField("id", id_dt),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def sig_iter(batches):
        for pdf in batches:
            texts = pdf[text_col]
            flat, offsets = _shingle_sets(texts, n)
            sigs: list[list[int]] = [[] for _ in range(len(texts))]
            if len(flat):
                fb, fo = bytes_view_of_strings(pd.Series(flat))
                h, _ = murmur3_x64_128(fb, fo, seed=seed)
                _minhash_fold(
                    h, offsets, a_p, b_p,
                    lambda row, m: sigs.__setitem__(row, m.view(np.int64).tolist()),
                    cap=chunk_shingles,
                )
            yield pd.DataFrame({"id": widen(pdf[id_col]), "sig": sigs})

    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        sig_iter, schema=out_schema
    )


def minhash_signatures_with_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 128,
    n: int = 3,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """(id, sig array<long>, shingles array<long>) — signatures plus the
    sorted distinct shingle-hash set, so LSH candidates can be EXACTLY
    verified (array_intersect) without re-shingling."""
    from pyspark.sql import types as T

    a_p, b_p = _perm_params(num_perm, seed)
    id_dt, widen = _id_out(df, id_col)
    out_schema = T.StructType(
        [
            T.StructField("id", id_dt),
            T.StructField("sig", T.ArrayType(T.LongType())),
            T.StructField("shingles", T.ArrayType(T.LongType())),
        ]
    )

    def sig_iter(batches):
        for pdf in batches:
            texts = pdf[text_col]
            flat, offsets = _shingle_sets(texts, n)
            sigs = [[] for _ in range(len(texts))]
            shs = [[] for _ in range(len(texts))]
            if len(flat):
                fb, fo = bytes_view_of_strings(pd.Series(flat))
                h, _ = murmur3_x64_128(fb, fo, seed=seed)

                def sink(row, m):
                    sigs[row] = m.view(np.int64).tolist()
                    shs[row] = np.sort(
                        h[offsets[row] : offsets[row + 1]].view(np.int64)
                    ).tolist()

                _minhash_fold(h, offsets, a_p, b_p, sink)
            yield pd.DataFrame(
                {"id": widen(pdf[id_col]), "sig": sigs, "shingles": shs}
            )

    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        sig_iter, schema=out_schema
    )


def minhash_dedup_pairs_verified(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    n: int = 3,
) -> DataFrame:
    """Sub-quadratic near-dup pairs with EXACT Jaccard output.

    LSH candidate generation (only colliding pairs are scored) followed by
    exact set verification via array_intersect on the shingle-hash sets.
    At threshold 0.8 with 32×4 bands, a true pair escapes candidacy with
    probability (1-J⁴)³² ≤ 5e-8 — the output matches the brute-force exact
    join w.h.p., which is what lets this path carry a SQL oracle while
    staying sub-quadratic."""
    rows_per_band = _band_geometry(num_perm, bands)
    # materialize once: the signature+shingle relation feeds the LSH
    # self-join (both branches) AND both verify joins — without this the
    # shingling/minhash mapInPandas pass runs up to 4×
    sigs = minhash_signatures_with_shingles(
        df, id_col, text_col, num_perm=num_perm, n=n
    ).localCheckpoint(eager=False)
    cands = lsh_candidate_pairs(
        sigs.select("id", "sig"), bands=bands, rows_per_band=rows_per_band
    )
    sa = sigs.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _band_geometry(num_perm: int, bands: int) -> int:
    """rows_per_band with the srp_signatures-style validation: bands >
    num_perm would give zero-length band slices (every band hash becomes
    the same constant for every doc → a full O(n²) candidate
    cross-product), and a non-divisible num_perm silently drops tail
    permutations, breaking the documented (1-J^r)^b recall math."""
    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    if num_perm < bands:
        raise ValueError(
            f"num_perm ({num_perm}) must be >= bands ({bands}): empty band "
            "slices hash identically for every doc and candidate "
            "generation degenerates to the full cross-product"
        )
    if num_perm % bands != 0:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}) — "
            f"{num_perm % bands} tail permutations would be silently unused"
        )
    return num_perm // bands


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 32, rows_per_band: int = 4
) -> DataFrame:
    """Distinct candidate pairs from banded LSH.

    Band hash = xxhash64 of the band's signature slice (JVM-side); bucket
    join = groupBy-free self-equijoin on (band, hash).  Pairs sharing ≥1
    band collide — P[collide] = 1-(1-J^r)^b."""
    if bands < 1 or rows_per_band < 1:
        raise ValueError(
            f"bands ({bands}) and rows_per_band ({rows_per_band}) must be "
            ">= 1 (empty band slices collide every pair of documents)"
        )
    bands_col = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(
                    F.slice("sig", j * rows_per_band + 1, rows_per_band),
                    F.lit(j),
                ).alias("h"),
            )
            for j in range(bands)
        ]
    )
    bucketed = (
        sigs.filter(F.size("sig") > 0)
        .select("id", F.explode(bands_col).alias("bh"))
        .select("id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
    )
    l = bucketed.select(F.col("id").alias("id_a"), "band", "h")
    r = bucketed.select(F.col("id").alias("id_b"), "band", "h")
    return (
        l.join(r, ["band", "h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def estimated_jaccard(sigs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Attach sig-agreement Jaccard estimate to candidate pairs."""
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard", F.round(agree / F.size("sig_a"), 6)
        )
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 32,
    n: int = 3,
) -> DataFrame:
    """End-to-end near-dup pairs: signatures → LSH candidates → estimate ≥
    threshold.  Sub-quadratic: only colliding pairs are ever scored."""
    rows_per_band = _band_geometry(num_perm, bands)
    # materialized once — feeds the LSH self-join and both estimate joins
    sigs = minhash_signatures(
        df, id_col, text_col, num_perm=num_perm, n=n
    ).localCheckpoint(eager=False)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    return estimated_jaccard(sigs, cands).filter(
        F.col("est_jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seed: int = DEFAULT_SEED,
    chunk_tokens: int | None = None,
) -> DataFrame:
    """(id, simhash long): sign-sum of token-hash bit vectors per doc.

    The (tokens × 64) ±1 matrix is the working set — folded over doc
    chunks bounded by token count (same memory discipline as
    _minhash_fold: a batch of multi-KB pages would otherwise materialize
    GBs per python worker)."""
    from pyspark.sql import types as T

    id_dt, widen = _id_out(df, id_col)
    out_schema = T.StructType(
        [T.StructField("id", id_dt), T.StructField("simhash", T.LongType())]
    )
    chunk_tokens = _SIMHASH_CHUNK_TOKENS if chunk_tokens is None else chunk_tokens

    def sim_iter(batches):
        bit_idx = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            toks = _tokenize_catalyst_rule(pdf[text_col]).map(
                lambda ts: [t for t in ts if t]  # simhash weighs tokens;
                # empty edge tokens carry no content, drop them like
                # tokens_nonempty does on the Catalyst simhash path
            )
            counts = toks.map(len).to_numpy(dtype=np.int64)
            flat_tokens = [t for ts in toks for t in ts]
            out = np.zeros(len(pdf), dtype=np.int64)
            if flat_tokens:
                fb, fo = bytes_view_of_strings(pd.Series(flat_tokens))
                h, _ = murmur3_x64_128(fb, fo, seed=seed)
                offsets = np.zeros(len(pdf) + 1, dtype=np.int64)
                np.cumsum(counts, out=offsets[1:])

                def sign_bits(lo, hi):
                    return (
                        (h[lo:hi, None] >> bit_idx[None, :]) & np.uint64(1)
                    ).astype(np.int64) * 2 - 1  # ±1 per bit

                def pack(sums):
                    return ((sums > 0).astype(np.uint64) << bit_idx).sum(
                        axis=1, dtype=np.uint64
                    )

                for start, end in _chunked_doc_ranges(offsets, chunk_tokens):
                    lo, hi = offsets[start], offsets[end]
                    if hi <= lo:
                        continue
                    if end == start + 1 and hi - lo > chunk_tokens:
                        # one doc wider than the cap: running sign-sum
                        acc = np.zeros(64, dtype=np.int64)
                        for blo in range(lo, hi, chunk_tokens):
                            bhi = min(blo + chunk_tokens, hi)
                            acc += sign_bits(blo, bhi).sum(axis=0)
                        out[start] = pack(acc[None, :]).view(np.int64)[0]
                        continue
                    bits = sign_bits(lo, hi)
                    seg = offsets[start:end]
                    nz = np.nonzero(counts[start:end] > 0)[0]
                    if len(nz):
                        sums = np.add.reduceat(bits, seg[nz] - lo, axis=0)
                        out[start + nz] = pack(sums).view(np.int64)
            yield pd.DataFrame({"id": widen(pdf[id_col]), "simhash": out})

    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        sim_iter, schema=out_schema
    )


def _segment_slices(bits: int, n_segments: int) -> list[tuple[int, int]]:
    """(start_bit, width) per segment, spreading any remainder evenly."""
    base = bits // n_segments
    rem = bits % n_segments
    out = []
    start = 0
    for j in range(n_segments):
        w = base + (1 if j < rem else 0)
        out.append((start, w))
        start += w
    return out


def _multi_index_blocked(
    sh: DataFrame, bits: int, n_segments: int, r: int
) -> DataFrame:
    """(id, simhash, combo, v): each row replicated once per r-segment
    combination, keyed by the combo's xxhash64 — the pigeonhole multi-index
    shared by hamming_pairs and simhash_bucket_stats."""
    from itertools import combinations

    slices = _segment_slices(bits, n_segments)
    seg_cols = [
        F.shiftrightunsigned(F.col("simhash"), start).bitwiseAND(
            F.lit((1 << w) - 1)
        )
        for start, w in slices
    ]
    combos = list(combinations(range(n_segments), r))
    keys = F.array(
        *[
            F.struct(
                F.lit(ci).alias("combo"),
                F.xxhash64(F.lit(ci), *[seg_cols[j] for j in combo]).alias("h"),
            )
            for ci, combo in enumerate(combos)
        ]
    )
    return sh.select("id", "simhash", F.explode(keys).alias("kv")).select(
        "id",
        "simhash",
        F.col("kv.combo").alias("combo"),
        F.col("kv.h").alias("v"),
    )


def simhash_bucket_stats(
    sh: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    n_segments: int | None = None,
) -> DataFrame:
    """Candidate-bucket size distribution of the pigeonhole multi-index —
    the diagnostic for picking the `n_segments` knee at corpus scale.
    Candidate pairs per bucket grow ~size²/2, so the max/p99.9 bucket size
    is what the join actually costs; widening n_segments shrinks buckets
    exponentially at the price of C(n, n-h) replicas per row.  Returns one
    row: (n_buckets, max_bucket, p999_bucket, candidate_pairs, replicas).
    """
    if n_segments is None:
        n_segments = max_hamming + 1
    r = n_segments - max_hamming
    if r < 1:
        raise ValueError(
            f"n_segments={n_segments} must exceed max_hamming={max_hamming}"
        )
    sizes = (
        _multi_index_blocked(sh, bits, n_segments, r)
        .groupBy("combo", "v")
        .agg(F.count("*").alias("c"))
    )
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("c").alias("max_bucket"),
        F.percentile_approx("c", 0.999).alias("p999_bucket"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias(
            "candidate_pairs"
        ),
        F.sum("c").alias("replicas"),
    )


def hamming_pairs(
    sh: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    n_segments: int | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs of (id, simhash) rows with Hamming distance ≤
    max_hamming — EXACT via the generalized pigeonhole multi-index join.

    Split the hash into n_segments; a pair with ≤ max_hamming differing bits
    has ≥ r = n_segments - max_hamming segments *equal*, so it collides on
    ≥1 of the C(n_segments, r) r-segment combinations.  The join key is the
    xxhash64 of (combo_id, the combo's segment values) — 8 bytes on the
    shuffle regardless of combo width.

    n_segments is the scale knob: the default max_hamming+1 (r=1) joins on
    single segments — 64/4 = 16-bit buckets, which go quadratic at billions
    of docs (2^16 buckets).  n_segments=8 with max_hamming=3 joins on
    5-segment combos (C(8,5)=56 replicas/row, ~40-bit key space) — more
    shuffle volume, exponentially smaller buckets; pick the knee for the
    corpus size.  Candidates are verified with JVM-side bit_count(xor), so
    every setting returns the identical exact pair set.
    """
    if n_segments is None:
        n_segments = max_hamming + 1
    r = n_segments - max_hamming
    if r < 1:
        raise ValueError(
            f"n_segments={n_segments} must exceed max_hamming={max_hamming}"
        )
    # materialize (id, simhash) once: both self-join branches read it,
    # instead of recomputing the upstream hash (for simhash_sql that's the
    # whole explode + 60-aggregate groupBy, twice).  eager=False: no job at
    # plan-construction time.  Executor-local blocks are lost with an
    # executor — on long-lived clusters with decommissioning, swap for a
    # reliable checkpoint() dir; recompute-on-loss is acceptable here
    # because the upstream is deterministic.
    sh = sh.localCheckpoint(eager=False)
    blocked = _multi_index_blocked(sh, bits, n_segments, r)
    l = blocked.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("h_a"), "combo", "v"
    )
    rr = blocked.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("h_b"), "combo", "v"
    )
    return (
        l.join(rr, ["combo", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_segments: int | None = None,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming over the murmur3 numpy
    simhash — exact candidate generation via the pigeonhole multi-index
    (see hamming_pairs), then bit_count(xor) verification."""
    return hamming_pairs(
        simhash64(df, id_col, text_col),
        max_hamming=max_hamming,
        bits=64,
        n_segments=n_segments,
    )


# --- cross-engine-reproducible simhash (the SQL-oracle-able variant) --------

SIMHASH_SQL_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit int


def simhash_sql(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_SQL_BITS
) -> DataFrame:
    """(id, simhash) computed ENTIRELY in Catalyst from md5 token hashes.

    md5 is the one keyed-identical hash both Spark and DuckDB expose, which
    makes this variant bit-for-bit reproducible in ANSI SQL — the
    differential-oracle role (two independent engines must agree, the
    pattern of /root/reference/tests/integration/
    bloomfilter_simd_comparison_test.go:280-381).  The murmur3 numpy
    `simhash64` stays the throughput path; this one is pure JVM codegen:
    explode tokens → 60-bit md5-prefix hash → one groupBy(id) computing
    packed per-bit one-counts → unpack + majority-vote bits.  One shuffle
    on id; no Python at all.

    Count packing (r2 VERDICT item 6): the per-bit ±1 sign sum s_j = 2c_j−n
    (c_j = count of tokens with bit j set, n = token count), so bit j of the
    simhash is just the majority vote 2c_j > n.  Three 21-bit c_j lanes pack
    into one BIGINT SUM, shrinking the aggregate from 60 sign-sum buffers to
    20 packed buffers + n.  Lane width caps a document at 2^21−1 (≈2M)
    tokens — beyond any web page a cleaning pipeline keeps; larger docs
    would overflow a lane and must be length-filtered first (the standard
    pipeline_clean_corpus stage does).
    """
    from bloomfilter_spark.functions.hashing import md5_hash60

    LANES = 3
    LANE_W = 21

    toks = F.split(F.lower(F.trim(F.col(text_col))), WS_SPLIT_PATTERN)
    ex = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    ex = ex.select("id", md5_hash60(F.col("tok")).alias("h"))
    n_aggs = -(-bits // LANES)
    aggs = []
    for a in range(n_aggs):
        term = None
        for lane in range(LANES):
            j = a * LANES + lane
            if j >= bits:
                break
            bit = (
                F.shiftrightunsigned(F.col("h"), j)
                .bitwiseAND(F.lit(1))
                .cast("long")
            )
            t = bit * F.lit(1 << (LANE_W * lane))
            term = t if term is None else term + t
        aggs.append(F.sum(term).alias(f"p{a}"))
    sums = ex.groupBy("id").agg(F.count("*").alias("n_tok"), *aggs)
    packed = None
    for j in range(bits):
        a, lane = divmod(j, LANES)
        c_j = F.shiftrightunsigned(F.col(f"p{a}"), LANE_W * lane).bitwiseAND(
            F.lit((1 << LANE_W) - 1)
        )
        term = F.when(c_j * 2 > F.col("n_tok"), F.lit(1 << j)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    # the lane-width cap is ENFORCED, not advisory: a ≥2^21-token document
    # would carry one lane's count into the next and silently corrupt two
    # bits — fail loudly instead (length-filter upstream, or use the
    # unpacked murmur simhash64 path for pathological inputs)
    guarded = F.when(
        F.col("n_tok") >= F.lit(1 << LANE_W),
        F.raise_error(
            F.format_string(
                "simhash_sql: document %s has %s tokens >= 2^21 — packed "
                "lane counters would overflow; length-filter first",
                F.col("id").cast("string"),
                F.col("n_tok").cast("string"),
            )
        ).cast("long"),
    ).otherwise(packed.cast("long"))
    return sums.select("id", guarded.alias("simhash"))


def simhash_dedup_pairs_sql(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_segments: int | None = None,
) -> DataFrame:
    """Exact Hamming-≤k pairs over the SQL-reproducible md5 simhash — the
    catalog entry DuckDB can replay value-for-value."""
    return hamming_pairs(
        simhash_sql(df, id_col, text_col),
        max_hamming=max_hamming,
        bits=SIMHASH_SQL_BITS,
        n_segments=n_segments,
    )
