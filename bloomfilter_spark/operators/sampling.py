"""Deterministic content-hash sampling for training-data pipelines.

`df.sample()` is seed-and-partitioning dependent: the same row can fall in
or out of the sample when the scan's split layout changes, which breaks
reproducibility contracts ("the 10% eval slice must be the same slice
forever").  These operators decide membership from a hash of the ROW KEY
instead — a pure function of the data:

- stable under repartitioning, retries, cluster size, and engine;
- consistent across tables (the same key samples identically everywhere,
  so joins between sampled tables stay aligned);
- md5-based, so an external SQL engine (the DuckDB oracle) reproduces the
  exact row set — sampling is fully value-checkable, not just
  statistically checkable.

Rule: keep row ⇔ md5_60bit(key || ':' || seed) < rate · 2⁶⁰.  The 60-bit
hash is uniform, so P[keep] = rate per key; duplicates of a key all keep
or all drop (dedup-friendly).  Pure Catalyst — filters push down around
it and no Python runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bloomfilter_spark.functions.hashing import md5_hash60

_HASH_SPACE = 1 << 60  # 15 hex chars of md5


def _key_hash(key_col: str, seed: int) -> Column:
    # NULL keys hash as the empty string: all nulls share one fate per
    # seed (rate=1.0 keeps every row — a NULL-propagating hash would
    # silently DROP null-keyed rows at any rate)
    keyed = F.concat(
        F.coalesce(F.col(key_col).cast("string"), F.lit("")),
        F.lit(f":{seed}"),
    )
    return md5_hash60(keyed)


def sample_hash_threshold(rate: float) -> int:
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"sample rate must be in [0, 1], got {rate}")
    return int(rate * _HASH_SPACE)


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Keep each key with probability `rate`, decided by the key's hash."""
    return df.filter(_key_hash(key_col, seed) < F.lit(sample_hash_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum rates (e.g. per-language downsampling), same hash rule.

    rates: stratum value -> keep probability; strata not listed use
    default_rate.  The SAME key hash is used for every stratum, so raising
    a stratum's rate only ADDS rows to its sample (nested samples — the
    property curriculum/ablation pipelines rely on)."""
    thr: Column = F.lit(sample_hash_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(sample_hash_threshold(rate))
        ).otherwise(thr)
    return df.filter(_key_hash(key_col, seed) < thr)


def sample_k_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """EXACTLY min(k, group size) rows per group, chosen uniformly and
    deterministically: rank rows within each group by their content hash
    (ties broken by the key itself) and keep rank ≤ k.

    Rate-based sampling gives binomial group sizes; carve-outs like "a
    1000-doc eval slice per language" need exact counts.  One shuffle
    (window partitioned BY GROUP — never a global order).  The hash order
    is a pure function of the data, so the slice is stable under
    repartitioning and SQL-replayable; with the same seed, k' > k yields
    a superset (nested slices, like the rate-based samplers)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _key_hash(key_col, seed), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def sample_weighted_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Exactly min(k, eligible rows) rows, sampled WITHOUT replacement
    with probability proportional to weight — quality-weighted carve-outs
    ("5 docs per language, longer docs more likely, same 5 forever").

    Algorithm A-ES (Efraimidis & Spirakis 2006): each row gets
    ``r = ln(u) / w`` with ``u = (hash+1)/2⁶⁰ ∈ (0, 1]`` from the
    content-hash rule, and the k LARGEST r win — equivalent to the
    classical ``u^(1/w)`` keys but numerically tamer.  Because u comes
    from md5_hash60 rather than an RNG, the selection is a pure function
    of the data: stable under repartitioning/retries/engines and fully
    SQL-replayable (catalog query `sample_weighted` value-checks every
    selected row and its rank key).

    r is rounded to 9 decimals before ranking — the pinned cross-engine
    semantic (ln differs by ~1 ulp between libm and Java); ties (already
    measure-zero, quantized or not) break on the key, nulls last, like
    `filter_top_quality`.  Rows with NULL or non-positive weight are
    never selected (they carry no sampling mass; NaN weights fail the
    ``> 0`` predicate in Spark — the SQL oracle must exclude NaN
    explicitly, where ``NaN > 0`` is TRUE in DuckDB).

    One shuffle (window partitioned by group, or one global partition
    when group_col is None — use groups at scale, exactly like
    `sample_k_per_group`)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    w = F.col(weight_col).cast("double")
    u = (_key_hash(key_col, seed) + F.lit(1)).cast("double") / F.lit(
        float(_HASH_SPACE)
    )
    r = F.round(F.log(u) / w, 9)
    eligible = df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
    parts = [group_col] if group_col is not None else []
    win = Window.partitionBy(*parts).orderBy(
        F.desc("__es_r"), F.col(key_col).asc_nulls_last()
    )
    return (
        eligible.withColumn("__es_r", r)
        .withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
        .withColumnRenamed("__es_r", "sample_key")
    )


def normalize_weights(weights: dict[str, float]) -> dict[str, float]:
    """weights → proportions summing to 1, in SORTED-key accumulation
    order so the float sum (and thus every downstream rate) is identical
    no matter how the caller's dict was built."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    total = 0.0
    for k in sorted(weights):
        total += float(weights[k])
    if total <= 0.0:
        raise ValueError("weights must sum to a positive value")
    return {k: float(weights[k]) / total for k in sorted(weights)}


def mix_rates(
    totals: dict[str, int], weights: dict[str, float], budget: int
) -> dict[str, float]:
    """Per-source keep rates for proportional mixing: source s should
    contribute ≈ budget · w_s bytes, so rate_s = min(1, budget·w_s /
    total_s) — clipped when the source is too small to fill its share
    (no upsampling; callers wanting replication handle that upstream).

    Pure float arithmetic with pinned association order, so a SQL engine
    replays the exact thresholds (the catalog oracle does)."""
    norm = normalize_weights(weights)
    rates: dict[str, float] = {}
    for s, w in norm.items():
        t = int(totals.get(s, 0))
        rates[s] = 1.0 if t <= 0 else min(1.0, budget * w / t)
    return rates


def mix_to_budget(
    df: DataFrame,
    key_col: str,
    source_col: str,
    size_col: str,
    weights: dict[str, float],
    budget: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic corpus mixing: downsample each source so expected
    bytes match `budget · weight_share` (curriculum / data-mixture
    construction).  Two scans: a per-source size aggregate (driver-sized —
    one row per source), then the same hash-threshold filter as
    `stratified_sample`, so the mixture is stable under repartitioning and
    nested across budgets (raising the budget only ADDS documents).
    Sources absent from `weights` are dropped (weight 0)."""
    size = F.coalesce(F.col(size_col).cast("long"), F.lit(0))
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(size).alias("t"))
        .collect()
    }
    rates = mix_rates(totals, weights, budget)
    return stratified_sample(
        df, key_col, source_col, rates, default_rate=0.0, seed=seed
    )
