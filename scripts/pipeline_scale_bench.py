#!/usr/bin/env python
"""Scale measurements for the round-3 pipeline operators.

Each op runs at a scale 40-10,000x the driver fixture on local[32]
(pages cache / synthetic Spark-range inputs — no external data), timed
warm after a trigger count.  Emits one JSON line per op; paste into
BENCH.md §8.  Run on a QUIET box (see BENCH.md measurement notes).

Usage: python scripts/pipeline_scale_bench.py [pages_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bloomfilter_spark.plans.session import get_spark  # noqa: E402
from bloomfilter_spark.sources.pages import pages_table_path  # noqa: E402


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    wall = time.perf_counter() - t0
    print(json.dumps({"op": name, "wall_s": round(wall, 2), **out}), flush=True)


def main() -> None:
    pages_n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="pipeline_scale_bench")
    pages = spark.read.parquet(pages_table_path(pages_n)).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    pages.count()  # warm page cache + JVM

    # 1. duplicated-span stats (ExactSubstr shape) over real page text
    from bloomfilter_spark.operators.spans import duplicate_span_stats

    def run_spans():
        out = duplicate_span_stats(pages, "doc_id", "text", k=4, min_count=2)
        row = out.agg(
            F.count("*").alias("docs"),
            F.sum("n_dup_tokens").alias("dup_tokens"),
            F.sum("n_tokens").alias("tokens"),
        ).collect()[0]
        return {
            "pages": pages_n,
            "tokens": int(row.tokens),
            "dup_tokens": int(row.dup_tokens),
        }

    timed("duplicate_span_stats", run_spans)

    # 2. connected components: synthetic 5M-node graph, 8M edges
    #    (hash-derived pseudo-random topology: mix of chains + clusters)
    from bloomfilter_spark.operators.components import connected_components

    n_nodes, n_edges = 5_000_000, 8_000_000

    def run_cc():
        e = (
            spark.range(n_edges)
            .select(
                F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("id_a"),
                F.pmod(F.xxhash64(F.col("id") + 7), F.lit(n_nodes)).alias(
                    "id_b"
                ),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )
        comp = connected_components(e)
        row = comp.agg(
            F.count("*").alias("nodes"),
            F.countDistinct("component").alias("components"),
        ).collect()[0]
        return {
            "edges": n_edges,
            "nodes": int(row.nodes),
            "components": int(row.components),
        }

    timed("connected_components", run_cc)

    # 3. sessionization: 50M synthetic events, 1M users, 30-day span
    from bloomfilter_spark.operators.sessions import sessionize

    n_ev, n_users = 50_000_000, 1_000_000

    def run_sessions():
        ev = spark.range(n_ev).select(
            F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200)
                + F.pmod(F.xxhash64(F.col("id") + 13), F.lit(30 * 86400))
            ).alias("ts"),
            (F.pmod(F.xxhash64(F.col("id") + 29), F.lit(1000)) / 100.0).alias(
                "value"
            ),
        )
        out = sessionize(ev, "user_id", "ts", gap="30 minutes", value_col="value")
        row = out.agg(
            F.count("*").alias("sessions"), F.sum("n_events").alias("events")
        ).collect()[0]
        return {
            "events": int(row.events),
            "users": n_users,
            "sessions": int(row.sessions),
        }

    timed("sessionize", run_sessions)

    # 4. as-of join: 20M left x 4M right over 500k keys
    from bloomfilter_spark.operators.temporal import asof_join

    nl, nr, nk = 20_000_000, 4_000_000, 500_000

    def run_asof():
        mk = lambda n, salt: spark.range(n).select(
            F.pmod(F.xxhash64(F.col("id") + salt), F.lit(nk)).alias("k"),
            F.timestamp_seconds(
                F.lit(1704067200)
                + F.pmod(F.xxhash64(F.col("id") + salt + 1), F.lit(30 * 86400))
            ).alias("ts"),
            F.col("id").alias("v"),
        )
        j = asof_join(
            mk(nl, 100), mk(nr, 200).dropDuplicates(["k", "ts"]), "k", "ts", ["v"]
        )
        row = j.agg(
            F.count("*").alias("rows"),
            F.count("v_matched").alias("matched"),
        ).collect()[0]
        return {
            "left": nl,
            "right": nr,
            "matched": int(row.matched),
            "rows": int(row.rows),
        }

    timed("asof_join", run_asof)

    # 5. inverted index build + pruned BM25 query over page text
    from bloomfilter_spark.operators.search import (
        bm25_search_indexed,
        write_inverted_index,
    )

    idx = f"/tmp/bfs_scale_invidx_{os.getpid()}"

    def run_index_build():
        write_inverted_index(pages, idx, "doc_id", "text", n_buckets=64)
        n = spark.read.parquet(idx).count()
        return {"pages": pages_n, "postings": n}

    timed("inverted_index_build", run_index_build)

    def run_index_query():
        out = bm25_search_indexed(
            spark, idx, ["tegiqozu", "jeki", "solavu"], topk=20
        )
        return {"rows": out.count()}

    timed("bm25_indexed_query", run_index_query)
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    shutil.rmtree(f"{idx}__stats", ignore_errors=True)


if __name__ == "__main__":
    main()
