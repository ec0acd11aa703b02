"""Shard packing / global prefix sum: exactness vs a pandas replay,
partitioning invariance, and the bounded-skew balance property."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomfilter_spark.functions.hashing import md5_hash60
from bloomfilter_spark.operators.packing import (
    global_running_sum,
    pack_shards,
    shard_summary,
)

TARGET = 4096


@pytest.fixture(scope="module")
def sized_docs(spark):
    # deterministic hash order key + unique tiebreak, like the catalog query
    return (
        spark.range(0, 700)
        .withColumn("doc_id", F.col("id"))
        .withColumn("ok", md5_hash60(F.col("doc_id").cast("string")))
        .withColumn("sz", F.pmod(F.col("doc_id") * 2654435761, F.lit(997)) + 3)
        .drop("id")
    )


def _replay(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ok", "doc_id"], kind="stable").reset_index(drop=True)
    pdf["running_bytes"] = pdf["sz"].cumsum()
    start = pdf["running_bytes"] - pdf["sz"]
    pdf["shard_id"] = start // TARGET
    return pdf


def test_running_sum_matches_pandas(spark, sized_docs):
    got = (
        global_running_sum(sized_docs, ["ok", "doc_id"], "sz")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _replay(sized_docs.toPandas()).sort_values("doc_id").reset_index(drop=True)
    assert got["running_bytes"].tolist() == want["running_bytes"].tolist()


def test_shard_assignment_partitioning_invariant(spark, sized_docs):
    a = (
        pack_shards(sized_docs.repartition(1), ["ok", "doc_id"], "sz", TARGET)
        .select("doc_id", "shard_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_shards(sized_docs.repartition(7), ["ok", "doc_id"], "sz", TARGET, n_ranges=3)
        .select("doc_id", "shard_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["shard_id"].tolist() == b["shard_id"].tolist()
    want = _replay(sized_docs.toPandas()).sort_values("doc_id").reset_index(drop=True)
    assert a["shard_id"].tolist() == want["shard_id"].tolist()


def test_shard_balance_bounded_by_max_row(spark, sized_docs):
    packed = pack_shards(sized_docs, ["ok", "doc_id"], "sz", TARGET)
    summ = shard_summary(packed, "sz").toPandas().sort_values("shard_id")
    max_row = sized_docs.agg(F.max("sz")).collect()[0][0]
    # shard s covers byte range [s*T, (s+1)*T): rows starting inside it sum
    # to < T + max_row; non-final shards reach at least past their range start
    assert (summ["shard_bytes"] < TARGET + max_row).all()
    non_final = summ.iloc[:-1]
    assert (non_final["shard_bytes"] > TARGET - max_row).all()
    # shard ids are contiguous from 0
    assert summ["shard_id"].tolist() == list(range(len(summ)))


def test_null_sizes_count_as_zero(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, sz long"
    )
    got = (
        global_running_sum(df, ["doc_id"], "sz")
        .orderBy("doc_id")
        .select("running_bytes")
        .toPandas()["running_bytes"]
        .tolist()
    )
    assert got == [10, 10, 15]


def test_empty_order_cols_rejected(spark, sized_docs):
    with pytest.raises(ValueError):
        global_running_sum(sized_docs, [], "sz")


def test_shard_id_exact_beyond_double_precision(spark):
    """shard_id must use true integer division: at offsets > 2^53 a
    double-quotient path rounds the dividend and is off by one shard
    (r3 ADVICE).  start = 2^55 + 3 with target 3 is such a case."""
    from bloomfilter_spark.operators.packing import pack_shards

    big = (1 << 55) + 3
    df = spark.createDataFrame([(1, big), (2, 5)], "doc_id long, sz long")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(df, ["doc_id"], "sz", 3).collect()
    }
    assert got[1] == 0
    assert got[2] == big // 3  # 12009599006321323; double math gives ...322
