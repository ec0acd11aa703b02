"""Skew handling: salted repartitioning (north rule: 'explicit salted
repartitioning to defuse host-skewed partitions').

Web data is host-skewed (Zipf): a handful of hosts dominate row counts, so
hash-partitioning by host sends whole hot hosts to single tasks. Salting
splits each key across `salts` sub-partitions; sketch merges being
associative make the re-combine free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(
    df: DataFrame, key_col: str, num_partitions: int, salts: int = 8
) -> DataFrame:
    """Repartition by (key, salt) where salt = xxhash64(whole row cheap
    surrogate) % salts. Deterministic (no rand()), so partition contents are
    reproducible — required for checkpoint/resume identity."""
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(salts)).alias("_salt")
    return (
        df.withColumn("_salt", salt)
        .repartition(num_partitions, F.col(key_col), F.col("_salt"))
        .drop("_salt")
    )


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Fan a narrow input out to the cluster before CPU-heavy per-row work.

    A small parquet file arrives as 1 split; shingling/hashing it inline
    would then run on one core no matter the cluster size.  Repartition is
    a no-op (returns df) when the scan already has enough splits — at real
    scale the 128 MB-split scan parallelism is already there and no extra
    shuffle happens."""
    if min_parts is None:
        min_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_parts:
        return df
    return df.repartition(min_parts)


def partition_stats(df: DataFrame) -> DataFrame:
    """Rows per partition — the skew diagnostic used in tests/bench."""
    from pyspark.sql.functions import spark_partition_id

    return df.withColumn("_pid", spark_partition_id()).groupBy("_pid").count()
