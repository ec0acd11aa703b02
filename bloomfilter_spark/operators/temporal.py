"""Temporal joins Spark lacks natively — as-of join.

as-of join: for every left row, the single right row with the largest
right.ts <= left.ts (backward; forward = smallest right.ts >= left.ts)
per key — the join pandas.merge_asof / DuckDB `ASOF JOIN` do, which a
plain equi/range join can't express without a top-1-per-row cut.

Spark-first plan: ONE shuffle.  Union both sides tagged, then a per-key
ordered window carries the last-seen right payload forward
(F.last(ignorenulls=True) over rows UNBOUNDED PRECEDING..CURRENT).  At
equal timestamps the right row sorts before the left row, so ties match
(<=, same as DuckDB's ASOF `>=` condition).  This is the canonical
distributed merge-asof: no range-explode, no per-row subquery, cost =
shuffle(|L|+|R|) + per-key sort, and AQE handles key skew like any other
single-shuffle sort operator.

Contract: right must be unique per (key, ts) — otherwise "the" matched
row is ill-defined (the operator would pick one nondeterministically);
the fixture and oracle queries satisfy it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    value_cols: list[str],
    direction: str = "backward",
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join.

    Returns every left row with `value_cols` and the match's timestamp
    appended (each named `<col><suffix>`), null when the key has no right
    row on the matching side of left's timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in value_cols]
    )
    # NULL-key right rows can never match under equality semantics
    # (pandas merge_asof / DuckDB ASOF `ON l.k = r.k` never pairs NULLs),
    # but Window.partitionBy groups NULL keys into one partition and would
    # carry them into NULL-key left rows — drop them here; NULL-key left
    # rows then see an empty right side in their partition and match
    # nothing, which is the documented semantics.
    key_ok = F.lit(True)
    for k in keys:
        key_ok = key_ok & F.col(k).isNotNull()
    r = (
        right.filter(F.col(ts_col).isNotNull())  # un-timestamped rows can't match
        .filter(key_ok)
        .select(*keys, F.col(ts_col), payload.alias("__payload"))
        .withColumn("__side", F.lit(0))
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(dict(r.dtypes)["__payload"])
    )
    u = l.unionByName(r, allowMissingColumns=True)
    ts_ord = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a null-timestamp left row matches nothing (DuckDB/pandas asof
    # semantics); without the guard it would sort to an end of the window
    # frame and pick up whatever carry lives there
    matched = F.when(
        F.col(ts_col).isNotNull(),
        F.last(
            F.when(F.col("__side") == 0, F.col("__payload")), ignorenulls=True
        ).over(w),
    )
    out = (
        u.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .drop("__side", "__payload")
    )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col(f"__m.{ts_col}").alias(f"{ts_col}{suffix}"))
    sel.extend(F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols)
    return out.select(*sel)
