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
