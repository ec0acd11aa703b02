"""Bloom-sidecar file skipping: exactness vs an unpruned filter, real
partition pruning in the plan, and the no-false-negative contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.skipindex import (
    bloom_skipping_lookup,
    write_partitioned_with_bloom,
)


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    # 40 partitions, 2500 keys scattered by hash — each key in ONE partition
    df = (
        spark.range(0, 2500)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit("p"), F.pmod(F.xxhash64("id"), F.lit(40)).cast("string"))
            .alias("part"),
            (F.col("id") * 3).alias("payload"),
        )
    )
    path = str(tmp_path_factory.mktemp("skipidx") / "data")
    n = write_partitioned_with_bloom(df, path, "part", "k", fpp=0.01)
    assert n == 40
    return df, path


def test_lookup_exact_and_pruned(spark, indexed):
    df, path = indexed
    keys = [5, 333, 1777, 2499, 10_000_000]  # last absent
    rows, n_cand, n_parts = bloom_skipping_lookup(spark, path, "part", "k", keys)
    got = sorted((r["k"], r["payload"]) for r in rows.collect())
    want = sorted(
        (r["k"], r["payload"])
        for r in df.filter(F.col("k").isin(keys)).collect()
    )
    assert got == want and len(got) == 4  # exact, absent key absent
    # 4 present keys live in <= 4 partitions; fpp adds ~0.4 expected extras
    assert n_parts == 40
    assert n_cand <= 8  # way under the 40 an unindexed scan reads

    # the isin on the partition column must reach the scan as a real
    # partition filter (directory pruning, not a post-scan filter).
    # FileSourceScan always prints a PartitionFilters clause — assert the
    # filter is INSIDE it, not just present somewhere in the plan
    plan = rows._jdf.queryExecution().executedPlan().toString()
    inside = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "part#" in inside and "IN" in inside.upper()


def test_no_false_negatives_all_keys(spark, indexed):
    df, path = indexed
    # every 97th key must be found — Blooms cannot lose a key
    keys = list(range(0, 2500, 97))
    rows, _, _ = bloom_skipping_lookup(spark, path, "part", "k", keys)
    assert rows.count() == len(keys)


def test_empty_keys_rejected(spark, indexed):
    _, path = indexed
    with pytest.raises(ValueError):
        bloom_skipping_lookup(spark, path, "part", "k", [])


def test_null_partition_rows_are_found(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (3, "b", 30)],
        "k long, part string, payload long",
    )
    path = str(tmp_path / "nulldata")
    assert write_partitioned_with_bloom(df, path, "part", "k") == 3
    rows, n_cand, n_parts = bloom_skipping_lookup(
        spark, path, "part", "k", [1, 2, 3]
    )
    got = sorted(r["k"] for r in rows.collect())
    assert got == [1, 2, 3]  # the NULL-partition row must NOT be lost
    assert n_parts == 3
