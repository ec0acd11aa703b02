"""Snapshot drift metrics (operators/drift.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bloomfilter_spark.operators.drift import (
    freq_tv_distance,
    kll_ks_distance,
    snapshot_drift,
)
from bloomfilter_spark.sketches.freqitems import FrequentItemsSketch
from bloomfilter_spark.sketches.kll import KLLSketch


class TestKSDistance:
    def test_identical_sketches_are_zero(self):
        rng = np.random.default_rng(3)
        data = rng.normal(0, 1, 20_000)
        a, b = KLLSketch(k=200), KLLSketch(k=200)
        a.update(data)
        b.update(data)
        ks, bound = kll_ks_distance(a, b)
        assert ks <= bound  # same data → within rank error of 0

    def test_known_shift_detected(self):
        # uniform[0,1] vs uniform[0.3,1.3]: true KS = 0.3
        rng = np.random.default_rng(4)
        ua = rng.uniform(0, 1, 50_000)
        ub = rng.uniform(0.3, 1.3, 50_000)
        a, b = KLLSketch(k=200), KLLSketch(k=200)
        a.update(ua)
        b.update(ub)
        ks, bound = kll_ks_distance(a, b)
        # sampling noise ~ 1.36*sqrt(2/50k) ≈ 0.009, sketch error ≈ 0.033
        assert abs(ks - 0.3) <= bound + 0.02

    def test_empty_side_is_nan(self):
        a = KLLSketch(k=200)
        b = KLLSketch(k=200)
        b.update(np.array([1.0]))
        ks, _ = kll_ks_distance(a, b)
        assert math.isnan(ks)


class TestTVDistance:
    def test_exact_below_capacity(self):
        import pandas as pd

        a = FrequentItemsSketch(64)
        a.update(pd.Series(["x"] * 60 + ["y"] * 40))
        b = FrequentItemsSketch(64)
        b.update(pd.Series(["x"] * 40 + ["y"] * 40 + ["z"] * 20))
        tv, bound = freq_tv_distance(a, b)
        # p_a = (.6, .4, 0); p_b = (.4, .4, .2) → TV = .5*(.2+0+.2) = .2
        assert math.isclose(tv, 0.2, abs_tol=1e-12)
        assert bound == 0.0  # never pruned → exact

    def test_empty_side_is_nan(self):
        a = FrequentItemsSketch(8)
        tv, _ = freq_tv_distance(a, FrequentItemsSketch(8))
        assert math.isnan(tv)


class TestSnapshotDrift:
    @pytest.fixture(scope="class")
    def drift_rows(self, spark, documents):
        import pyspark.sql.functions as F

        a = documents
        b = documents.withColumn("n_chars", F.col("n_chars") + 100)
        rows = snapshot_drift(a, b, columns=["n_chars", "lang"]).collect()
        return {r["column"]: r for r in rows}

    def test_planted_numeric_shift_detected(self, drift_rows, documents):
        r = drift_rows["n_chars"]
        assert r["mean_shift"] == pytest.approx(100.0, abs=1e-9)  # exact moments
        assert r["ks_est"] > r["ks_bound"]  # a +100 shift is far beyond noise
        assert r["n_a"] == r["n_b"] == documents.count()

    def test_unshifted_categorical_is_quiet(self, drift_rows):
        r = drift_rows["lang"]
        assert r["tv_est"] == pytest.approx(0.0, abs=1e-12)
        assert r["novel_b_est"] == 0.0
        assert r["ks_est"] is None and r["mean_a"] is None

    def test_novelty_estimate(self, spark, documents):
        import pyspark.sql.functions as F

        a = documents.filter(F.col("doc_id") % 2 == 0)
        b = documents  # b introduces all the odd ids
        r = {
            x["column"]: x
            for x in snapshot_drift(a, b, columns=["doc_id"]).collect()
        }["doc_id"]
        exact_novel = documents.filter(F.col("doc_id") % 2 == 1).count()
        assert r["novel_b_est"] == pytest.approx(exact_novel, rel=0.1)

    def test_no_shared_columns_raises(self, spark):
        df_a = spark.createDataFrame([(1,)], "x long")
        df_b = spark.createDataFrame([("s",)], "x string")
        with pytest.raises(ValueError, match="no profiled column"):
            snapshot_drift(df_a, df_b)


class TestExactKS:
    """exact_ks_distance: scalable exact two-sample KS (VERDICT r4 #4 —
    replaces the single-partition global-window ECDF in the drift
    catalog query)."""

    def test_matches_scipy_style_reference(self, spark):
        from bloomfilter_spark.operators.drift import exact_ks_distance

        rng = np.random.default_rng(11)
        xa = rng.normal(0.0, 1.0, 400).round(3)
        xb = rng.normal(0.4, 1.0, 300).round(3)
        df_a = spark.createDataFrame([(float(v),) for v in xa], "v double")
        df_b = spark.createDataFrame([(float(v),) for v in xb], "v double")
        got = exact_ks_distance(df_a, df_b, "v")

        # reference: brute-force ECDF sup-gap at the union of sample points
        support = np.unique(np.concatenate([xa, xb]))
        fa = np.searchsorted(np.sort(xa), support, side="right") / len(xa)
        fb = np.searchsorted(np.sort(xb), support, side="right") / len(xb)
        want = float(np.max(np.abs(fa - fb)))
        assert got == pytest.approx(want, abs=1e-12)

    def test_null_and_empty_sides(self, spark):
        from bloomfilter_spark.operators.drift import exact_ks_distance

        df_a = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
        empty = spark.createDataFrame([(None,)], "v double")
        assert math.isnan(exact_ks_distance(df_a, empty, "v"))
        # identical samples -> KS exactly 0
        assert exact_ks_distance(df_a, df_a, "v") == 0.0

    def test_stacked_multi_column_equals_single(self, spark):
        """exact_ks_distances (one shared stacked pass) must return
        bit-identical values to the per-column function, and NaN for a
        column empty on one side — the drift query relies on both."""
        from bloomfilter_spark.operators.drift import (
            exact_ks_distance,
            exact_ks_distances,
        )

        rng = np.random.default_rng(7)
        rows_a = [
            (int(v), int(w))
            for v, w in zip(
                rng.integers(0, 200, 300), rng.integers(50, 400, 300)
            )
        ]
        rows_b = [
            (int(v), int(w) + 20)
            for v, w in zip(
                rng.integers(30, 230, 250), rng.integers(50, 400, 250)
            )
        ]
        df_a = spark.createDataFrame(rows_a, "x long, y long")
        df_b = spark.createDataFrame(rows_b, "x long, y long")
        multi = exact_ks_distances(df_a, df_b, ["x", "y"])
        assert multi["x"] == exact_ks_distance(df_a, df_b, "x")
        assert multi["y"] == exact_ks_distance(df_a, df_b, "y")

        # y all-NULL on one side -> NaN for y, x unaffected
        df_b_null = df_b.selectExpr("x", "cast(NULL as long) as y")
        part = exact_ks_distances(df_a, df_b_null, ["x", "y"])
        assert part["x"] == exact_ks_distance(df_a, df_b_null, "x")
        assert math.isnan(part["y"])

    def test_no_single_partition_window_in_plan(self, spark):
        """The plan must contain no unpartitioned WindowExec — the whole
        point of the range-shuffle prefix-sum rewrite."""
        from bloomfilter_spark.operators.packing import global_running_sum

        df = spark.range(0, 1000).selectExpr("id as v", "1 as ca")
        out = global_running_sum(df, ["v"], "ca", out_col="cum")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan


def test_exact_ks_distances_handles_quoted_column_names(spark):
    """Column names containing quotes/backticks must survive the stacked
    multi-column path exactly like the single-column F.col path."""
    import pandas as pd

    from bloomfilter_spark.operators.drift import (
        exact_ks_distance,
        exact_ks_distances,
    )

    name = "it's `odd`"
    a = spark.createDataFrame(pd.DataFrame({name: [1, 2, 3, 4, 5]}))
    b = spark.createDataFrame(pd.DataFrame({name: [3, 4, 5, 6, 7]}))
    multi = exact_ks_distances(a, b, [name])
    single = exact_ks_distance(a, b, name)
    assert abs(multi[name] - single) < 1e-12
