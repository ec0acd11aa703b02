"""Sessionization — gap-based event grouping per key.

Spark-first: the native `F.session_window(ts, gap)` aggregation (the same
merging-window machinery Structured Streaming uses for session windows)
does the gaps-and-islands pass in ONE shuffle on the session key — no
LAG + running-sum double window scan.  Merge semantics (pinned by
tests/test_dataops.py::test_sessionize_gap_boundaries): each event opens
the closed interval [ts, ts+gap]; touching windows merge, so a new
session starts exactly when the previous-event gap is STRICTLY GREATER
than `gap` — the rule the SQL oracle replays with LAG + a running sum.

Scale notes: one hash shuffle on key_col, then per-key local merge — no
global sort, no driver state.  A pathological single hot key serializes
into one task; salting can't help here (sessions need the key's full
timeline), so skew is inherent to the semantics — same as any engine's
SESSION window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _epoch_us(df: DataFrame, ts_col: str):
    """Epoch microseconds, timezone-independent.  TIMESTAMP_NTZ (what
    parquet timestamps load as) is wall-clock arithmetic vs the NTZ epoch
    — no session-timezone dependence; TIMESTAMP (LTZ) is unix_micros."""
    if dict(df.dtypes)[ts_col] == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            F.col(ts_col),
        )
    return F.unix_micros(F.col(ts_col))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "12 hours",
    value_col: str | None = None,
) -> DataFrame:
    """Per-key sessions: (key, session_idx, session_start_us, session_end_us,
    n_events[, sum_value]).

    session_idx numbers a key's sessions in time order from 1;
    session_start_us / session_end_us are epoch microseconds of the first
    and last event in the session (timezone-independent, engine-portable).
    """
    tus = _epoch_us(df, ts_col)
    aggs = [
        F.min(tus).alias("session_start_us"),
        F.max(tus).alias("session_end_us"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    sessions = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .drop("session_window")
    )
    order = Window.partitionBy(key_col).orderBy("session_start_us")
    return sessions.select(
        F.col(key_col),
        F.row_number().over(order).alias("session_idx"),
        "session_start_us",
        "session_end_us",
        "n_events",
        *([F.col("sum_value")] if value_col is not None else []),
    )
