#!/usr/bin/env python
"""Grouped (per-tenant) sharded membership at 10M keys — BENCH.md §5
companion (r2 VERDICT item 3's measurement half).

Builds one sharded Bloom per lang over the 10,000,000-page table's urls
(5 tenants × 16 hash shards, 1% FPP, shard filters sized from their own
key counts), then probes all 10M inserted urls plus 1M synthetic
negatives routed by (lang, hash).  Reports build/probe walls and the
membership gates: false negatives MUST be 0; FP rate ≤ 2× configured.

Usage: python scripts/membership_scale_bench.py [n_pages]
Prints one JSON line; paste into BENCH.md §5.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    from pyspark.sql import functions as F

    from bloomfilter_spark.operators.partitioned import (
        bloom_build_sharded_grouped,
        sharded_grouped_might_contain,
    )
    from bloomfilter_spark.plans.session import get_spark
    from bloomfilter_spark.sources.pages import ensure_pages

    spark = get_spark(app_name="grouped-membership-bench")
    path = ensure_pages(spark, n)
    pages = spark.read.parquet(path).select("lang", "url")
    langs = [r["lang"] for r in pages.select("lang").distinct().collect()]

    n_shards = 16
    t0 = time.perf_counter()
    shards = bloom_build_sharded_grouped(
        pages, "lang", "url", fpp=0.01, n_shards=n_shards
    ).cache()
    n_blobs = shards.count()
    build_s = time.perf_counter() - t0

    neg = spark.range(1_000_000).select(
        F.element_at(
            F.array(*[F.lit(l) for l in langs]),
            (F.pmod(F.col("id"), F.lit(len(langs))) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("https://never-inserted.invalid/"), F.col("id")).alias(
            "url"
        ),
        F.lit(False).alias("is_inserted"),
    )
    probes = pages.withColumn("is_inserted", F.lit(True)).unionAll(neg)

    t0 = time.perf_counter()
    agg = (
        sharded_grouped_might_contain(probes, "lang", "url", shards, n_shards)
        .agg(
            F.count("*").alias("n_probes"),
            F.sum(
                (F.col("is_inserted") & ~F.col("might_contain")).cast("long")
            ).alias("false_negatives"),
            F.sum(
                (~F.col("is_inserted") & F.col("might_contain")).cast("long")
            ).alias("fp"),
            F.sum((~F.col("is_inserted")).cast("long")).alias("negs"),
        )
        .first()
    )
    probe_s = time.perf_counter() - t0

    out = {
        "n_keys": n,
        "n_tenants": len(langs),
        "n_shards_per_tenant": n_shards,
        "n_blobs": n_blobs,
        "build_s": round(build_s, 1),
        "build_keys_per_s": round(n / build_s),
        "probe_s": round(probe_s, 1),
        "probe_rate_per_s": round(int(agg["n_probes"]) / probe_s),
        "false_negatives": int(agg["false_negatives"]),
        "fp_rate": round(int(agg["fp"]) / int(agg["negs"]), 5),
        "loadavg": os.getloadavg()[0],
    }
    assert out["false_negatives"] == 0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
