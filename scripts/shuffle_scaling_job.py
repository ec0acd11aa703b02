#!/usr/bin/env python
"""Child job for shuffle_scaling_bench.py — run under spark-submit.

Runs the two shuffle-heavy round-3 operators (sessionize, asof_join) on
deterministic Spark-range synthetic inputs (identical at every
parallelism level) and prints one JSON line with walls + throughputs.

argv: <cores> <n_events> <n_left>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    cores, n_ev, nl = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    spark = (
        SparkSession.builder.appName(f"shuffle-scale-{cores}")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.range(1000).count()  # warm

    from bloomfilter_spark.operators.sessions import sessionize
    from bloomfilter_spark.operators.temporal import asof_join

    n_users = n_ev // 50
    ev = spark.range(n_ev, numPartitions=cores * 4).select(
        F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.xxhash64(F.col("id") + 13), F.lit(30 * 86400))
        ).alias("ts"),
        (F.pmod(F.xxhash64(F.col("id") + 29), F.lit(1000)) / 100.0).alias(
            "value"
        ),
    )
    t0 = time.perf_counter()
    n_sessions = sessionize(
        ev, "user_id", "ts", gap="30 minutes", value_col="value"
    ).count()
    sess_wall = time.perf_counter() - t0

    nk, nr = nl // 40, nl // 5
    mk = lambda n, salt: spark.range(n, numPartitions=cores * 4).select(
        F.pmod(F.xxhash64(F.col("id") + salt), F.lit(nk)).alias("k"),
        F.timestamp_seconds(
            F.lit(1704067200)
            + F.pmod(F.xxhash64(F.col("id") + salt + 1), F.lit(30 * 86400))
        ).alias("ts"),
        F.col("id").alias("v"),
    )
    t0 = time.perf_counter()
    n_rows = (
        asof_join(
            mk(nl, 100), mk(nr, 200).dropDuplicates(["k", "ts"]), "k", "ts", ["v"]
        )
        .filter(F.col("v_matched").isNotNull())
        .count()
    )
    asof_wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "sessionize_wall_s": round(sess_wall, 2),
                "sessionize_events_per_s": int(n_ev / sess_wall),
                "n_sessions": n_sessions,
                "asof_wall_s": round(asof_wall, 2),
                "asof_rows_per_s": int(nl / asof_wall),
                "asof_matched": n_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
