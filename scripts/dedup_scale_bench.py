#!/usr/bin/env python
"""Dedup family at 2M pages (BENCH.md §6 scale-up; r2 VERDICT item 7).

Measures, over the cached 2,000,000-page synthetic Common-Crawl-style
table on local[32]:

  1. MinHash-LSH near-dup mining end-to-end (signatures -> banded LSH ->
     estimate >= 0.7): wall + pair count.
  2. SimHash (murmur fast path) computed once, then the pigeonhole
     multi-index Hamming<=3 join at n_segments=4 (r=1, 16-bit buckets)
     vs n_segments=8 (r=5, C(8,5)=56 replicas, ~40-bit keys): wall, pair
     count (must be IDENTICAL — both are exact), and the candidate-bucket
     size distribution (simhash_bucket_stats) that exposes the knee.

Usage: python scripts/dedup_scale_bench.py [n_pages]
Prints one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from bloomfilter_spark.operators.dedup import (
        hamming_pairs,
        minhash_dedup_pairs,
        simhash64,
        simhash_bucket_stats,
    )
    from bloomfilter_spark.plans.session import get_spark
    from bloomfilter_spark.sources.pages import ensure_pages

    from pyspark.sql import functions as F

    spark = get_spark(app_name="dedup-scale-bench")
    path = ensure_pages(spark, n)
    # the dedup operators key on a LONG id (`id long` partial schemas);
    # urls map through xxhash64 (collision odds at 2M over 64 bits ~1e-7)
    pages = spark.read.parquet(path).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    out: dict = {"n_pages": n, "loadavg": os.getloadavg()[0]}

    t0 = time.perf_counter()
    pairs = minhash_dedup_pairs(pages, "doc_id", "text", threshold=0.7).count()
    out["minhash_lsh"] = {
        "pairs": pairs,
        "wall_s": round(time.perf_counter() - t0, 1),
    }

    t0 = time.perf_counter()
    sh = simhash64(pages, "doc_id", "text").localCheckpoint(eager=True)
    out["simhash_compute_s"] = round(time.perf_counter() - t0, 1)

    for nseg in (4, 8):
        t0 = time.perf_counter()
        cnt = hamming_pairs(sh, max_hamming=3, n_segments=nseg).count()
        wall = round(time.perf_counter() - t0, 1)
        stats = simhash_bucket_stats(
            sh, max_hamming=3, n_segments=nseg
        ).first().asDict()
        out[f"simhash_nseg{nseg}"] = {
            "pairs": cnt,
            "join_wall_s": wall,
            **{k: int(v) for k, v in stats.items()},
        }

    assert out["simhash_nseg4"]["pairs"] == out["simhash_nseg8"]["pairs"], (
        "pigeonhole settings must return the identical exact pair set"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
