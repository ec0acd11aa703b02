#!/usr/bin/env python
"""Scale measurements for the shard-packing / mixing / classifier /
n-gram-count operators over the cached pages table (default 2M pages —
400-4000x the driver fixture).  One JSON line per op; paste into
BENCH.md §10.  Run on a QUIET box.

Usage: python scripts/new_ops_scale_bench.py [pages_n]
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
    if "docs" in out:
        out["docs_per_s"] = round(out["docs"] / wall)
    print(json.dumps({"op": name, "wall_s": round(wall, 2), **out}), flush=True)


def main() -> None:
    pages_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app_name="new_ops_scale_bench")
    pages = spark.read.parquet(pages_table_path(pages_n)).select(
        F.xxhash64("url").alias("doc_id"),
        "text",
        F.length("text").alias("sz"),
        F.pmod(F.xxhash64("url", F.lit(1)), F.lit(20)).cast("string").alias("src"),
    )
    n = pages.count()  # warm

    from bloomfilter_spark.functions.classifier import classifier_scores
    from bloomfilter_spark.functions.hashing import md5_hash60
    from bloomfilter_spark.functions.textstats import tokens_nonempty, word_ngrams
    from bloomfilter_spark.operators.packing import pack_shards, shard_summary
    from bloomfilter_spark.operators.sampling import mix_to_budget

    def run_pack():
        # 64 MB shards over page text bytes, content-hash walk order
        keyed = pages.withColumn("ok", md5_hash60(F.col("doc_id").cast("string")))
        packed = pack_shards(keyed, ["ok", "doc_id"], "sz", 64 * 1024 * 1024)
        summ = shard_summary(packed, "sz").agg(
            F.count("*").alias("shards"),
            F.max("shard_bytes").alias("max_b"),
            F.min("shard_bytes").alias("min_b"),
        ).collect()[0]
        return {
            "docs": n,
            "shards": summ["shards"],
            "max_shard_mb": round(summ["max_b"] / 2**20, 1),
            "min_shard_mb": round(summ["min_b"] / 2**20, 1),
        }

    def run_mix():
        w = {str(i): float(i % 4 + 1) for i in range(20)}
        total = pages.agg(F.sum("sz")).collect()[0][0]
        mixed = mix_to_budget(pages, "doc_id", "src", "sz", w, int(total * 0.4))
        kept = mixed.agg(F.count("*").alias("k"), F.sum("sz").alias("b")).collect()[0]
        return {"docs": n, "kept": kept["k"],
                "kept_frac_bytes": round(kept["b"] / total, 4)}

    def run_classifier():
        agg = classifier_scores(pages, "text", dim=1024).agg(
            F.count("*").alias("d"),
            F.sum("n_tokens").alias("t"),
            F.sum(F.col("keep").cast("int")).alias("k"),
        ).collect()[0]
        return {"docs": n, "tokens": agg["t"], "kept": agg["k"]}

    def run_ngrams():
        toks = pages.select(tokens_nonempty(F.col("text")).alias("ts"))
        grams = toks.select(F.explode(word_ngrams("ts", 3)).alias("ngram"))
        top = (
            grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 10)
            .orderBy(F.desc("cnt"), "ngram").limit(100)
        )
        rows = top.collect()
        return {"docs": n, "topk": len(rows),
                "max_cnt": rows[0]["cnt"] if rows else None}

    def run_incremental_dedup():
        # ref = first 60% of pages; new = the rest + 2% planted dups
        from bloomfilter_spark.functions.hashing import md5_hash60
        from bloomfilter_spark.operators.membership import bloom_anti_join

        fp = md5_hash60(F.coalesce(F.col("text"), F.lit("")))
        bucket = F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(100))
        ref = pages.filter(bucket < 60).select(fp.alias("ref_fp"))
        new = (
            pages.filter(bucket >= 60).select("doc_id", fp.alias("fp"))
            .unionByName(
                pages.filter(bucket < 2).select(
                    (F.col("doc_id") + 1).alias("doc_id"), fp.alias("fp")
                )
            )
        )
        kept = bloom_anti_join(
            new, "fp", ref, "ref_fp",
            n_expected=int(n * 0.6) + 1, counter_filter=True,
        )
        return {"docs": n, "new_docs": new.count(), "kept": kept.count()}

    timed("incremental_dedup_bloom_anti", run_incremental_dedup)
    timed("pack_shards_64mb", run_pack)
    timed("mix_to_budget_40pct", run_mix)
    timed("classifier_score_d1024", run_classifier)
    timed("ngram_counts_top100", run_ngrams)
    spark.stop()


if __name__ == "__main__":
    main()
