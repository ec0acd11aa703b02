"""Streaming sessionization — session_window + watermark, append mode.

The same native session_window aggregation operators/sessions.py uses in
batch, run through Structured Streaming: state holds each key's open
sessions, merges on arrival, and emits a session exactly once when the
event-time watermark passes its end (append mode).  Batch ≡ stream is
pinned by the catalog query (full fixture) and
tests/test_streaming.py::test_streaming_sessions_equal_batch.

Timezone discipline: watermarks require TIMESTAMP (LTZ), but epoch
microseconds are computed from the original TIMESTAMP_NTZ column BEFORE
the cast, so emitted session bounds are wall-clock-stable no matter the
session timezone of whoever runs the query.  The LTZ cast only shifts the
session_window bucket *labels*, never the gap structure — sessions are
defined by event spacing, which is timezone-invariant.

Flushing a finite test stream: append mode only emits sessions the
watermark has passed, so a bounded replay would end with every
still-open session stuck in state.  The harness appends a far-future
sentinel row (its own key) as the final file; processing it advances the
watermark past every real session.  The sentinel's session itself is
never emitted — nothing ever outruns it — so it leaves no residue to
filter beyond its key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionized_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "12 hours",
    value_col: str | None = None,
    delay: str = "0 seconds",
) -> DataFrame:
    """Append-mode streaming session aggregation.

    Emits (key, session_start_us, session_end_us, n_events[, sum_value])
    once per closed session.  session_*_us are epoch microseconds of the
    first/last event, derived from the pre-cast NTZ wall clock when the
    input column is TIMESTAMP_NTZ.
    """
    from bloomfilter_spark.operators.sessions import _epoch_us

    # same epoch rule AND the same null-ts filter as batch sessionize
    # (operators/sessions.py): a null event time cannot join a session,
    # and the batch==stream parity contract requires one rule in one place
    prepared = (
        stream_df.filter(F.col(ts_col).isNotNull())
        .withColumn("__ts_us", _epoch_us(stream_df, ts_col))
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    )
    aggs = [
        F.min("__ts_us").alias("session_start_us"),
        F.max("__ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return (
        prepared.withWatermark(ts_col, delay)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
        .drop("session_window")
    )
