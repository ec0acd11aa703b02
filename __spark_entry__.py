"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query — distributed Bloom build over sf0.001
documents + membership probe, returning the invariant summary row.

queries()/oracle_sql(): the operator catalog from SURVEY.md §2, implemented
in bloomfilter_spark/queries.py. Sketch queries return exact quantities plus
bound-check booleans (see that module's docstring for the oracle pattern).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed Bloom membership invariants on sf0.001."""
    from bloomfilter_spark.queries import q_bloom_membership

    return q_bloom_membership(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bloomfilter_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bloomfilter_spark.queries import ORACLES

    return dict(ORACLES)
