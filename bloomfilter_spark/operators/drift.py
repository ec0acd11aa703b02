"""Sketch-based distribution drift between two corpus snapshots.

The daily diligence question on a growing web corpus — "did this crawl's
distribution move?" — needs per-column answers at 100 TB without ever
joining or co-shuffling the two snapshots.  Each snapshot is scanned ONCE
through the one-scan profile pipeline (operators/profile.py); all
comparison happens between merged sketches on the driver, so the cost is
two scans + O(columns) driver work, and the snapshots can live in
different tables, clusters, or points in time.

Per-column metrics:
  numeric      KS distance (Kolmogorov-Smirnov, sup-norm of the CDF gap)
               estimated from the two KLL sketches; bounded by the sum of
               their published rank errors.  Plus exact mean/std shift
               from the MomentsSketch (exact streaming moments).
  categorical  total-variation distance (0.5·L1 between the two frequency
               vectors) from the two Misra-Gries summaries — EXACT while
               each side's distinct count fits its capacity, and bounded
               by the sketches' deduction bounds beyond it.
  any hashed   distinct-count movement and novelty from the two HLLs:
               |union| − |A| estimates the distinct values B introduced
               (HLL union is lossless, sketches/hll.py:138).

KS-at-retained-points note: for empirical step CDFs the supremum is
attained at sample points; evaluating at the union of both sketches'
retained items reproduces the true KS up to the sketches' rank error,
which the reported `ks_bound` (εa + εb) accounts for.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F, types as T

from bloomfilter_spark.operators.packing import global_running_sums
from bloomfilter_spark.operators.profile import profile_sketches
from bloomfilter_spark.sketches.freqitems import FrequentItemsSketch
from bloomfilter_spark.sketches.kll import KLLSketch


def exact_ks_distance(df_a: DataFrame, df_b: DataFrame, column: str) -> float:
    """EXACT two-sample KS distance over `column` — the ground-truth
    companion to the sketch estimate in snapshot_drift, computed without
    a global single-reducer window.

    For empirical step CDFs the supremum is attained at sample points, so
    KS = max over DISTINCT values v of |F_a(v) - F_b(v)|.  Plan: one
    groupBy(v) shuffle collapses both samples to per-distinct-value
    counts (the only pass over data rows), then the cumulative counts are
    a global prefix sum over the v-ordered count rows — the same
    range-shuffle + driver-side-offsets pattern as the shard packer
    (operators/packing.py:global_running_sum), which never moves more
    than |distinct| rows and never forms a single partition.  NaN if
    either side has no non-NULL rows.
    """
    # quote the attribute name explicitly (backticks doubled) so names
    # containing quotes/backticks/dots resolve as ONE identifier instead
    # of being parsed as quoting syntax
    c = "`{}`".format(column.replace("`", "``"))
    u = (
        df_a.select(F.col(c).alias("v"), F.lit(1).alias("ia"), F.lit(0).alias("ib"))
        .unionAll(
            df_b.select(F.col(c).alias("v"), F.lit(0).alias("ia"), F.lit(1).alias("ib"))
        )
        .filter(F.col("v").isNotNull())
    )
    counts = u.groupBy("v").agg(F.sum("ia").alias("ca"), F.sum("ib").alias("cb"))
    # both cumulative columns in ONE range shuffle + ONE per-partition-
    # totals collect — composing two single-column global_running_sum
    # calls would pay the range shuffle, checkpoint, and offsets job
    # twice for identical layouts
    cum = global_running_sums(
        counts, ["v"], [("ca", "cum_a"), ("cb", "cum_b")]
    ).localCheckpoint(eager=False)
    tot = cum.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb")).first()
    na, nb = tot["na"], tot["nb"]
    if not na or not nb:
        return float("nan")
    gap = cum.agg(
        F.max(
            F.abs(F.col("cum_a") / F.lit(float(na)) - F.col("cum_b") / F.lit(float(nb)))
        ).alias("ks")
    ).first()["ks"]
    return float(gap)


def exact_ks_distances(
    df_a: DataFrame, df_b: DataFrame, columns: list[str]
) -> dict[str, float]:
    """EXACT two-sample KS over SEVERAL numeric columns in one shared
    pass — same math as `exact_ks_distance`, but the columns are stacked
    into (c, v) rows so the groupBy, the range shuffle, and the
    prefix-sum jobs run once for all of them instead of once per column.

    The shared prefix sum orders by (c, v): cumulative counts therefore
    run ACROSS column groups, and each column's true ECDF numerator is
    its cum minus the total of every preceding column group — a
    per-column constant computed from the (tiny) per-column totals and
    folded back into the one max-gap aggregation as literals.  Values are
    cast to long (callers pass integer-kind columns; the single-column
    function remains for arbitrary numeric types).
    """
    if not columns:
        return {}
    n = len(columns)
    # escape the interpolated names: a quote/backtick in a column name
    # must not break (or inject into) the generated stack() expression —
    # the single-column function accepts such names via F.col, so this
    # path must too
    stack = "stack({}, {}) AS (c, v)".format(
        n,
        ", ".join(
            "'{}', cast(`{}` as long)".format(
                c.replace("\\", "\\\\").replace("'", "\\'"),
                c.replace("`", "``"),
            )
            for c in columns
        ),
    )
    u = (
        df_a.selectExpr(stack)
        .select("c", "v", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
        .unionAll(
            df_b.selectExpr(stack)
            .select("c", "v", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
        )
        .filter(F.col("v").isNotNull())
    )
    counts = u.groupBy("c", "v").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    cum = global_running_sums(
        counts, ["c", "v"], [("ca", "cum_a"), ("cb", "cum_b")]
    ).localCheckpoint(eager=False)
    tots = {
        r["c"]: (int(r["na"] or 0), int(r["nb"] or 0))
        for r in cum.groupBy("c")
        .agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
        .collect()
    }
    # per-column exclusive base = totals of all lexicographically-earlier
    # columns (the prefix-sum order); columns absent from the data (all
    # NULL) report NaN like the single-column function
    base: dict[str, tuple[int, int]] = {}
    acc_a = acc_b = 0
    for c in sorted(tots):
        base[c] = (acc_a, acc_b)
        acc_a += tots[c][0]
        acc_b += tots[c][1]
    present = [c for c in columns if c in tots and tots[c][0] and tots[c][1]]
    out = {c: float("nan") for c in columns}
    if present:
        norm_a = F.lit(None).cast("double")
        norm_b = F.lit(None).cast("double")
        for c in present:
            (na, nb), (ba, bb) = tots[c], base[c]
            norm_a = F.when(
                F.col("c") == c, (F.col("cum_a") - F.lit(ba)) / F.lit(float(na))
            ).otherwise(norm_a)
            norm_b = F.when(
                F.col("c") == c, (F.col("cum_b") - F.lit(bb)) / F.lit(float(nb))
            ).otherwise(norm_b)
        gaps = (
            cum.groupBy("c")
            .agg(F.max(F.abs(norm_a - norm_b)).alias("ks"))
            .collect()
        )
        for r in gaps:
            if r["c"] in out and r["ks"] is not None:
                out[r["c"]] = float(r["ks"])
    return out


def kll_ks_distance(a: KLLSketch, b: KLLSketch) -> tuple[float, float]:
    """-> (ks_estimate, error_bound).  NaN estimate if either side is
    empty (no distribution to compare)."""
    bound = a.rank_error() + b.rank_error()
    va, _ = a._weighted_items()
    vb, _ = b._weighted_items()
    if va.size == 0 or vb.size == 0:
        return float("nan"), bound
    support = np.unique(np.concatenate([va, vb]))
    gaps = np.abs(a.rank(support) - b.rank(support))
    return float(np.max(gaps)), bound


def freq_tv_distance(
    a: FrequentItemsSketch, b: FrequentItemsSketch
) -> tuple[float, float]:
    """-> (tv_estimate, error_bound) over the union of retained keys.
    Exact (bound 0) when neither sketch has ever pruned; otherwise each
    side's per-key deduction plus its untracked mass caps the error."""
    if a.total == 0 or b.total == 0:
        return float("nan"), 0.0
    keys = set(a._counts) | set(b._counts)
    tv = 0.5 * sum(
        abs(a._counts.get(k, 0) / a.total - b._counts.get(k, 0) / b.total)
        for k in keys
    )
    # deduction ≤ error_bound() per retained key; untracked keys carry at
    # most the deducted mass (total − Σstored) on each side
    slack_a = (a.total - sum(a._counts.values())) / a.total
    slack_b = (b.total - sum(b._counts.values())) / b.total
    return float(tv), float(slack_a + slack_b)


_DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("column", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_a", T.LongType(), False),
        T.StructField("n_b", T.LongType(), False),
        T.StructField("mean_a", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("mean_shift", T.DoubleType(), True),
        T.StructField("std_a", T.DoubleType(), True),
        T.StructField("std_b", T.DoubleType(), True),
        T.StructField("ks_est", T.DoubleType(), True),
        T.StructField("ks_bound", T.DoubleType(), True),
        T.StructField("tv_est", T.DoubleType(), True),
        T.StructField("tv_bound", T.DoubleType(), True),
        T.StructField("distinct_a_est", T.DoubleType(), True),
        T.StructField("distinct_b_est", T.DoubleType(), True),
        T.StructField("novel_b_est", T.DoubleType(), True),
    ]
)


def snapshot_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str] | None = None,
    hll_precision: int = 14,
    kll_k: int = 200,
    freq_capacity: int = 4096,
    fanin: int | None = None,
) -> DataFrame:
    """Per-column drift summary between two snapshots — one row per
    column, driver-sized.  Columns default to the supported columns the
    two schemas share (same name AND same classification)."""
    per_a, _rows_a, kinds_a = profile_sketches(
        df_a, columns, hll_precision=hll_precision, kll_k=kll_k,
        freq_capacity=freq_capacity, sample_k=0, fanin=fanin,
    )
    per_b, _rows_b, kinds_b = profile_sketches(
        df_b, columns, hll_precision=hll_precision, kll_k=kll_k,
        freq_capacity=freq_capacity, sample_k=0, fanin=fanin,
    )
    shared = [c for c, k in kinds_a.items() if kinds_b.get(c) == k]
    if not shared:
        raise ValueError(
            "drift: snapshots share no profiled column with matching type "
            f"(a={kinds_a}, b={kinds_b})"
        )

    rows = []
    for c in shared:
        ka = kinds_a[c]
        sa, sb = per_a[c], per_b[c]
        rec: dict[str, object] = {
            "column": c,
            "kind": ka,
            "mean_a": None, "mean_b": None, "mean_shift": None,
            "std_a": None, "std_b": None,
            "ks_est": None, "ks_bound": None,
            "tv_est": None, "tv_bound": None,
            "distinct_a_est": None, "distinct_b_est": None,
            "novel_b_est": None,
        }
        if "moments" in sa:
            ma, mb = sa["moments"], sb["moments"]
            rec["n_a"], rec["n_b"] = ma.n_added, mb.n_added
            rec["mean_a"], rec["mean_b"] = ma.mean(), mb.mean()
            if ma.n and mb.n:
                rec["mean_shift"] = mb.mean() - ma.mean()
            rec["std_a"], rec["std_b"] = ma.std(), mb.std()
        else:
            rec["n_a"], rec["n_b"] = sa["strstats"].n, sb["strstats"].n
        if "kll" in sa:
            ks, bound = kll_ks_distance(sa["kll"], sb["kll"])
            if not np.isnan(ks):
                rec["ks_est"], rec["ks_bound"] = ks, bound
        if "freq" in sa:
            tv, bound = freq_tv_distance(sa["freq"], sb["freq"])
            if not np.isnan(tv):
                rec["tv_est"], rec["tv_bound"] = tv, bound
        if "hll" in sa:
            ha, hb = sa["hll"], sb["hll"]
            rec["distinct_a_est"] = float(ha.estimate())
            rec["distinct_b_est"] = float(hb.estimate())
            rec["novel_b_est"] = max(
                0.0, float(ha.union_estimate(hb) - ha.estimate())
            )
        rows.append(rec)

    field_names = [f.name for f in _DRIFT_SCHEMA.fields]
    data = [tuple(r[name] for name in field_names) for r in rows]
    return df_a.sparkSession.createDataFrame(data, schema=_DRIFT_SCHEMA)
