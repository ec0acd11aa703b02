"""Corpus mixing: rate math, clipping, nesting, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.operators.sampling import (
    mix_rates,
    mix_to_budget,
    normalize_weights,
)


def test_normalize_weights_order_independent():
    a = normalize_weights({"x": 1.0, "y": 3.0})
    b = normalize_weights({"y": 3.0, "x": 1.0})
    assert a == b == {"x": 0.25, "y": 0.75}
    with pytest.raises(ValueError):
        normalize_weights({})
    with pytest.raises(ValueError):
        normalize_weights({"x": -1.0})
    with pytest.raises(ValueError):
        normalize_weights({"x": 0.0})


def test_mix_rates_clipping_and_missing_sources():
    rates = mix_rates(
        {"big": 1000, "tiny": 10}, {"big": 1.0, "tiny": 1.0, "ghost": 2.0}, 100
    )
    # big gets 25% share of 100 over 1000 bytes -> 0.025; tiny's share
    # exceeds its size -> clipped to 1; ghost absent from data -> rate 1
    # (vacuous: no rows exist to keep)
    assert rates["big"] == pytest.approx(0.025)
    assert rates["tiny"] == 1.0
    assert rates["ghost"] == 1.0


@pytest.fixture(scope="module")
def sourced(spark):
    return (
        spark.range(0, 2000)
        .withColumn("src", F.concat(F.lit("s"), F.pmod("id", F.lit(4)).cast("string")))
        .withColumn("sz", F.lit(100))
        .withColumnRenamed("id", "k")
    )


def test_mix_hits_budget_within_tolerance(spark, sourced):
    # 4 sources x 500 rows x 100 bytes = 200k total; budget 40k
    weights = {"s0": 1.0, "s1": 1.0, "s2": 1.0, "s3": 1.0}
    mixed = mix_to_budget(sourced, "k", "src", "sz", weights, 40_000)
    per = {
        r["src"]: r["c"]
        for r in mixed.groupBy("src").agg(F.count("*").alias("c")).collect()
    }
    # each source expects 100 of 500 kept; hash sampling is binomial —
    # allow 4 sigma (~13)
    for s in weights:
        assert abs(per.get(s, 0) - 100) < 55
    # unknown-source rows are never kept
    extra = sourced.withColumn("src", F.lit("mystery"))
    assert mix_to_budget(extra, "k", "src", "sz", weights, 40_000).count() == 0


def test_mix_nested_budgets(spark, sourced):
    weights = {"s0": 1.0, "s1": 2.0, "s2": 3.0, "s3": 4.0}
    small = mix_to_budget(sourced, "k", "src", "sz", weights, 20_000)
    large = mix_to_budget(sourced, "k", "src", "sz", weights, 80_000)
    small_keys = {r["k"] for r in small.select("k").collect()}
    large_keys = {r["k"] for r in large.select("k").collect()}
    assert small_keys <= large_keys  # raising the budget only adds rows


def test_mix_partitioning_invariant(spark, sourced):
    weights = {"s0": 3.0, "s1": 1.0, "s2": 1.0, "s3": 1.0}
    a = {
        r["k"]
        for r in mix_to_budget(
            sourced.repartition(1), "k", "src", "sz", weights, 30_000
        ).select("k").collect()
    }
    b = {
        r["k"]
        for r in mix_to_budget(
            sourced.repartition(13), "k", "src", "sz", weights, 30_000
        ).select("k").collect()
    }
    assert a == b


class TestKPerGroup:
    def test_exact_counts_nesting_and_invariance(self, spark, sourced):
        from bloomfilter_spark.operators.sampling import sample_k_per_group

        k50 = sample_k_per_group(sourced, "k", "src", 50)
        per = {r["src"]: r["c"] for r in
               k50.groupBy("src").agg(F.count("*").alias("c")).collect()}
        assert per == {f"s{i}": 50 for i in range(4)}  # exactly k each
        # k' > k is a superset (nested slices)
        k80 = sample_k_per_group(sourced, "k", "src", 80)
        s50 = {r["k"] for r in k50.select("k").collect()}
        s80 = {r["k"] for r in k80.select("k").collect()}
        assert s50 <= s80
        # partitioning-invariant
        alt = sample_k_per_group(sourced.repartition(11), "k", "src", 50)
        assert {r["k"] for r in alt.select("k").collect()} == s50

    def test_small_groups_keep_everything(self, spark):
        from bloomfilter_spark.operators.sampling import sample_k_per_group
        import pytest

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "k long, src string"
        )
        out = sample_k_per_group(df, "k", "src", 10)
        assert out.count() == 3  # min(k, group size)
        with pytest.raises(ValueError):
            sample_k_per_group(df, "k", "src", 0)


class TestWeightedK:
    def test_k1_selection_tracks_weights(self, spark):
        """E-S with k=1 selects item i with probability exactly w_i/Σw.
        200 independent groups of {two weight-1 items, one weight-8 item}
        → the heavy item should win ≈ 0.8·200 times (±4σ ≈ 23)."""
        from bloomfilter_spark.operators.sampling import sample_weighted_k

        rows = []
        for g in range(200):
            rows += [(g * 3, g, 1.0), (g * 3 + 1, g, 1.0), (g * 3 + 2, g, 8.0)]
        df = spark.createDataFrame(rows, "k long, grp long, w double")
        won = sample_weighted_k(df, "k", "w", 1, group_col="grp")
        heavy = won.filter(F.col("k") % 3 == 2).count()
        assert won.count() == 200
        assert 137 <= heavy <= 183, heavy  # E[160], σ≈5.7

    def test_nested_deterministic_and_invariant(self, spark):
        from bloomfilter_spark.operators.sampling import sample_weighted_k

        rows = [(i, "g", float(1 + i % 17)) for i in range(300)]
        df = spark.createDataFrame(rows, "k long, grp string, w double")
        k10 = {r["k"] for r in sample_weighted_k(df, "k", "w", 10, "grp").collect()}
        k25 = {r["k"] for r in sample_weighted_k(df, "k", "w", 25, "grp").collect()}
        assert len(k10) == 10 and len(k25) == 25 and k10 <= k25  # nested
        alt = {r["k"] for r in
               sample_weighted_k(df.repartition(13), "k", "w", 10, "grp").collect()}
        assert alt == k10  # partitioning-invariant
        # different seed → a genuinely different slice
        other = {r["k"] for r in
                 sample_weighted_k(df, "k", "w", 10, "grp", seed=99).collect()}
        assert other != k10

    def test_nonpositive_and_null_weights_never_selected(self, spark):
        from bloomfilter_spark.operators.sampling import sample_weighted_k

        df = spark.createDataFrame(
            [(1, 1.0), (2, 0.0), (3, -2.0), (4, None), (5, float("nan")),
             (6, 3.0)],
            "k long, w double",
        )
        out = sample_weighted_k(df, "k", "w", 10)
        assert {r["k"] for r in out.collect()} == {1, 6}
        with pytest.raises(ValueError):
            sample_weighted_k(df, "k", "w", 0)
