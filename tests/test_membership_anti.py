"""bloom_anti_join: exactness vs a plain anti-join (FPs killed), the
counter-filter path, and tiny/saturated sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from bloomfilter_spark.operators.membership import bloom_anti_join


def _ids(df):
    return sorted(r["k"] for r in df.select("k").collect())


def test_matches_plain_anti_join(spark):
    probe = spark.range(0, 3000).select(F.col("id").alias("k"))
    build = spark.range(1000, 1500).select((F.col("id") * 2).alias("b"))
    want = _ids(
        probe.join(build, probe["k"] == F.col("b"), "left_anti")
    )
    for cf in (False, True):
        got = _ids(bloom_anti_join(probe, "k", build, "b", counter_filter=cf))
        assert got == want


def test_fp_killed_with_saturated_sketch(spark):
    # deliberately undersized sketch -> high FPP -> many candidates; the
    # exact confirm must still return the true anti-join
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    build = spark.range(0, 1000).select((F.col("id") * 3).alias("b"))
    want = _ids(probe.join(build, probe["k"] == F.col("b"), "left_anti"))
    got = _ids(
        bloom_anti_join(probe, "k", build, "b", n_expected=8, fpp=0.5)
    )
    assert got == want


def test_empty_sides(spark):
    probe = spark.range(0, 50).select(F.col("id").alias("k"))
    empty = spark.range(0, 0).select(F.col("id").alias("b"))
    assert _ids(bloom_anti_join(probe, "k", empty, "b")) == list(range(50))
    assert bloom_anti_join(empty.select(F.col("b").alias("k")), "k",
                           probe.select(F.col("k").alias("b")), "b").count() == 0
