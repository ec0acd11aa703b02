#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline query catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": ..., ...extras}

Extras (informational, not part of the driver contract): docs/sec sketch
build throughput over the synthetic Common-Crawl-style `pages` table — the
north-rule headline number (BASELINE.json: sketch-build throughput).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1"

    from bloomfilter_spark.plans.session import get_spark
    from bloomfilter_spark.queries import QUERIES

    spark = get_spark(app_name="bloomfilter_spark-bench")

    timings: dict[str, float] = {}
    # warm the JVM and the python-worker pool once so per-query numbers
    # measure the query, not executor/worker startup
    spark.range(1000).selectExpr("sum(id)").collect()
    par = spark.sparkContext.defaultParallelism

    def _noop(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        for pdf in it:
            yield pdf

    spark.range(0, par * 2, numPartitions=par * 2).mapInPandas(
        _noop, schema="id long"
    ).count()

    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            dt = time.perf_counter() - t0
        except Exception as exc:  # keep the bench line emitting no matter what
            dt = time.perf_counter() - t0
            print(f"[bench] query {name} FAILED: {exc}", file=sys.stderr)
        timings[name] = round(dt, 3)
        total += dt

    extras = {}
    try:
        extras = pages_throughput(spark)
    except Exception as exc:
        print(f"[bench] pages throughput failed: {exc}", file=sys.stderr)

    out = {
        "metric": "catalog wall time (sf%s) + pages sketch-build docs/sec" % sf,
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    out.update(extras)
    print(json.dumps(out))
    spark.stop()


def pages_throughput(spark) -> dict:
    """North-rule headline: docs/sec building the full sketch suite (Bloom +
    HLL + CMS + KLL + t-digest in ONE scan) over the synthetic pages table."""
    from bloomfilter_spark.sources.pages import ensure_pages
    from bloomfilter_spark.operators.pipeline import build_suite

    n_rows = int(os.environ.get("SPARK_GRAFT_PAGES_ROWS", "200000"))
    path = ensure_pages(spark, n_rows)
    df = spark.read.parquet(path)
    t0 = time.perf_counter()
    # n_expected passed explicitly: the timed region is the ONE sketch
    # scan, not a df.count() pre-pass
    suite = build_suite(df, n_expected=n_rows)
    dt = time.perf_counter() - t0
    out = {
        "pages_rows": n_rows,
        "pages_build_sec": round(dt, 3),
        "pages_docs_per_sec": round(n_rows / dt, 1),
        "pages_bloom_fpp_est": round(suite["bloom_url"].estimated_fpp(), 6),
    }
    # at 200k rows the wall is <1s and fixed-cost dominated; when the 2M
    # cached table is already materialized, also report the steady-state
    # rate (never generate here — keep the bench's runtime bounded)
    from bloomfilter_spark.sources.pages import pages_table_path

    path2m = pages_table_path(2_000_000)
    if n_rows != 2_000_000 and os.path.exists(os.path.join(path2m, "_SUCCESS")):
        df2 = spark.read.parquet(path2m)
        t0 = time.perf_counter()
        build_suite(df2, n_expected=2_000_000)
        dt2 = time.perf_counter() - t0
        out["pages2m_build_sec"] = round(dt2, 3)
        out["pages2m_docs_per_sec"] = round(2_000_000 / dt2, 1)
    return out


if __name__ == "__main__":
    main()
