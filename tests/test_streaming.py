"""Structured Streaming sketch accumulation tests: micro-batch folds equal
the batch build bit-for-bit; restart with replayed batch is a no-op."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from bloomfilter_spark.operators.build import bloom_factory, build_sketch, hll_factory
from bloomfilter_spark.sources.pages import pages_df
from bloomfilter_spark.streaming.accumulate import StreamingSketchAccumulator


@pytest.fixture()
def staged_pages(spark, tmp_path):
    """Three parquet files in one dir — the file stream delivers them as
    separate micro-batches with maxFilesPerTrigger=1."""
    src = str(tmp_path / "src")
    for i in range(3):
        pages_df(spark, 300, num_partitions=2).filter(
            (F.xxhash64("url") % 3) == i
        ).coalesce(1).write.mode("append").parquet(src)
    return src


def _stream(spark, src, acc, ckpt):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(acc)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_equals_batch(spark, staged_pages, tmp_path):
    factory = bloom_factory(1024, 0.01)
    acc = StreamingSketchAccumulator("url", factory, str(tmp_path / "state"))
    _stream(spark, staged_pages, acc, str(tmp_path / "ckpt"))
    assert acc.last_batch_id >= 2

    batch = build_sketch(spark.read.parquet(staged_pages), "url", factory)
    assert acc.sketch.to_bytes() == batch.to_bytes()  # commutative ⇒ bit-identical


def test_stream_restart_idempotent(spark, staged_pages, tmp_path):
    factory = hll_factory(precision=12)
    state = str(tmp_path / "state")
    acc = StreamingSketchAccumulator("url", factory, state)
    _stream(spark, staged_pages, acc, str(tmp_path / "ckpt"))
    blob1 = acc.sketch.to_bytes()

    # "restart": a fresh accumulator restores state; re-running the whole
    # stream from a new checkpoint replays every batch — all must be skipped
    acc2 = StreamingSketchAccumulator("url", factory, state)
    assert acc2.sketch.to_bytes() == blob1
    _stream(spark, staged_pages, acc2, str(tmp_path / "ckpt2"))
    assert acc2.sketch.to_bytes() == blob1  # replays were no-ops


def test_stream_restart_continues(spark, tmp_path):
    """New data after restart IS absorbed (only replayed ids are skipped)."""
    factory = bloom_factory(1024, 0.01)
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    p1 = pages_df(spark, 100, num_partitions=1)
    p1.coalesce(1).write.mode("append").parquet(src)

    acc = StreamingSketchAccumulator("url", factory, state)
    _stream(spark, src, acc, str(tmp_path / "ckpt"))

    p2 = pages_df(spark, 200, num_partitions=1).filter(
        F.xxhash64("url") % 7 == 0
    )
    p2.coalesce(1).write.mode("append").parquet(src)

    acc2 = StreamingSketchAccumulator("url", factory, state)
    _stream(spark, src, acc2, str(tmp_path / "ckpt"))  # same ckpt → only new file
    batch = build_sketch(spark.read.parquet(src), "url", factory)
    assert acc2.sketch.to_bytes() == batch.to_bytes()


def test_stream_freqitems_exact_below_capacity(spark, staged_pages, tmp_path):
    """Misra-Gries through the streaming fold: with capacity ≥ distinct
    hosts no prune ever fires, so the streamed summary must carry the EXACT
    per-host counts of the full input — order of micro-batches irrelevant.
    A capacity-16 accumulator over the same stream must still honor the
    deduction bound (underestimate-only, ≤ εN) batch-boundaries or not."""
    from bloomfilter_spark.operators.build import freqitems_factory

    pages = spark.read.parquet(staged_pages)
    hosts = pages.select(
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host")
    )
    src2 = str(tmp_path / "hosts_src")
    # re-stage as 3 single-file batches (pmod: % keeps sign and would DROP
    # negative-hash rows — the exact side below reads what was staged)
    for i in range(3):
        hosts.filter(F.pmod(F.xxhash64("host"), F.lit(3)) == i).coalesce(
            1
        ).write.mode("append").parquet(src2)
    staged = spark.read.parquet(src2)

    acc = StreamingSketchAccumulator(
        "host", freqitems_factory(4096), str(tmp_path / "fi_state")
    )
    _stream(spark, src2, acc, str(tmp_path / "fi_ckpt"))
    exact = {
        r["host"]: r["cnt"]
        for r in staged.groupBy("host").agg(F.count("*").alias("cnt")).collect()
    }
    assert acc.sketch.error_bound() == 0
    assert len(exact) <= 4096
    assert all(acc.sketch.estimate(h) == c for h, c in exact.items())

    # capacity BELOW the distinct-host count so prunes actually fire in
    # the streamed folds (the fixture has exactly 16 hosts — 16 would
    # make this assertion vacuous)
    assert len(exact) > 8
    tight = StreamingSketchAccumulator(
        "host", freqitems_factory(8), str(tmp_path / "fi8_state")
    )
    _stream(spark, src2, tight, str(tmp_path / "fi8_ckpt"))
    err = tight.sketch.error_bound()
    assert 0 < err <= tight.sketch.total // 9
    for h, c in exact.items():
        est = tight.sketch.estimate(h)
        assert est <= c and est >= c - err


def test_stream_theta_bit_identical_to_batch(spark, staged_pages, tmp_path):
    """Theta is commutative ⇒ the streamed fold is bit-identical to a
    batch build over the same rows (like Bloom), and stays exact below k."""
    from bloomfilter_spark.operators.build import theta_factory

    factory = theta_factory(16384)
    acc = StreamingSketchAccumulator("url", factory, str(tmp_path / "th_state"))
    _stream(spark, staged_pages, acc, str(tmp_path / "th_ckpt"))
    batch = build_sketch(spark.read.parquet(staged_pages), "url", factory)
    assert acc.sketch.to_bytes() == batch.to_bytes()
    assert acc.sketch.is_exact
    exact = spark.read.parquet(staged_pages).select("url").distinct().count()
    assert acc.sketch.estimate() == float(exact)


def test_stream_dds_equals_batch(spark, staged_pages, tmp_path):
    """DDSketch through the micro-batch fold: commutative bucket sums make
    the streamed sketch bit-identical to one batch build, at any batch
    slicing."""
    from bloomfilter_spark.operators.build import dds_factory

    factory = dds_factory(alpha=0.01)
    acc = StreamingSketchAccumulator(
        "n_chars", factory, str(tmp_path / "dds_state")
    )
    src_df = spark.read.parquet(staged_pages).withColumn(
        "n_chars", F.length("text")
    )
    src = str(tmp_path / "dds_src")
    src_df.write.parquet(src)
    acc2 = StreamingSketchAccumulator(
        "n_chars", factory, str(tmp_path / "dds_state2")
    )
    _stream(spark, src, acc2, str(tmp_path / "dds_ckpt"))
    batch = build_sketch(spark.read.parquet(src), "n_chars", factory)
    assert acc2.sketch.to_bytes() == batch.to_bytes()
    assert acc2.sketch.quantile(0.5) == batch.quantile(0.5)


def test_streaming_sessions_equal_batch(spark, tmp_path):
    """A session whose events straddle micro-batch boundaries must merge
    in state and emit ONCE with the full span; sentinel flushes the tail."""
    import datetime

    from pyspark.sql import functions as F

    from bloomfilter_spark.operators.sessions import sessionize
    from bloomfilter_spark.streaming.sessions import sessionized_stream

    T = lambda h, m=0: datetime.datetime(2024, 6, 1, h, m)
    rows = [
        # user 1: one session straddling the file split (gap 1h)
        (1, T(10, 0), 1.0), (1, T(10, 50), 2.0),   # file 0
        (1, T(11, 30), 4.0),                       # file 1 — merges
        (1, T(15, 0), 8.0),                        # file 1 — new session
        # user 2: single-event session in file 0 only
        (2, T(9, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    src = str(tmp_path / "src")
    df.filter(F.col("ts") < F.lit(T(11))).coalesce(1).write.mode("append").parquet(src)
    df.filter(F.col("ts") >= F.lit(T(11))).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(-1, datetime.datetime(2100, 1, 1), 0.0)], df.schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        sessionized_stream(stream, "user_id", "ts", gap="1 hour", value_col="value")
        .writeStream.format("memory")
        .queryName("t_stream_sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM t_stream_sess")
        .filter(F.col("user_id") != -1)
        .orderBy("user_id", "session_start_us")
        .toPandas()
    )
    spark.catalog.dropTempView("t_stream_sess")
    want = (
        sessionize(df, "user_id", "ts", gap="1 hour", value_col="value")
        .orderBy("user_id", "session_start_us")
        .toPandas()
    )
    cols = ["user_id", "session_start_us", "session_end_us", "n_events", "sum_value"]
    assert got[cols].values.tolist() == want[cols].values.tolist()
    # the straddling session merged: 3 events, 10:00 -> 11:30
    s = got.iloc[0]
    assert s["n_events"] == 3 and s["sum_value"] == 7.0


def test_stream_kll_honors_rank_bound(spark, tmp_path):
    """Compaction sketches (KLL/t-digest) streamed per-micro-batch are NOT
    byte-equal to the single n-ary batch merge (the compaction schedule
    depends on batch boundaries) — but every merge topology honors the
    published rank-error bound, which is the defined semantic at scale."""
    from bloomfilter_spark.operators.build import kll_factory

    # stage a numeric column (text length) for the quantile sketch
    src = str(tmp_path / "kll_src")
    for i in range(3):
        pages_df(spark, 300, num_partitions=2).filter(
            (F.xxhash64("url") % 3) == i
        ).select(F.length("text").alias("text_len")).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    factory = kll_factory(k=200)
    acc = StreamingSketchAccumulator("text_len", factory, str(tmp_path / "st"))
    _stream(spark, src, acc, str(tmp_path / "ck"))
    sk = acc.sketch
    import numpy as np

    vals = np.sort(
        spark.read.parquet(src).select("text_len").toPandas()
        .text_len.to_numpy()
    )
    for q in (0.25, 0.5, 0.9):
        est = sk.quantile(q)
        rank = float((vals <= est).mean())
        assert abs(rank - q) <= sk.rank_error() + 0.02, (q, est, rank)
