#!/usr/bin/env python
"""Scale measurements for the tokenizer surface (functions/tokenize.py):
BPE vocab training (bounded sample), distributed BPE encode throughput
(docs/s and tokens/s), and token-budget shard packing over the cached
2M-row Common-Crawl-style pages table.  One JSON line per op; paste into
BENCH.md.  Run on a QUIET box.

Usage: python scripts/tokenize_scale_bench.py [n_pages] [n_merges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bloomfilter_spark.plans.session import get_spark  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    from bloomfilter_spark.functions.hashing import md5_hash60
    from bloomfilter_spark.functions.tokenize import (
        bpe_token_stats,
        train_bpe_merges,
    )
    from bloomfilter_spark.operators.packing import pack_shards
    from bloomfilter_spark.sources.pages import ensure_pages

    spark = get_spark(app_name="tokenize_scale_bench")
    df = spark.read.parquet(ensure_pages(spark, n_pages)).select("url", "text")

    t0 = time.perf_counter()
    sample = [
        r["text"]
        for r in df.filter("text IS NOT NULL").limit(2000).collect()
    ]
    merges = train_bpe_merges(sample, n_merges)
    train_s = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": "bpe_train",
                "sample_docs": len(sample),
                "n_merges": len(merges),
                "wall_s": round(train_s, 2),
            }
        ),
        flush=True,
    )

    st = bpe_token_stats(df, merges, id_col="url")
    for trial in range(2):  # best-of-2: first run pays scan cache effects
        t0 = time.perf_counter()
        agg = st.agg(
            F.count("*").alias("docs"),
            F.sum("n_bpe_tokens").alias("tokens"),
            F.sum("n_bytes").alias("bytes"),
            F.min(F.col("recon_ok").cast("int")).alias("recon"),
        ).first()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "bpe_encode",
                    "trial": trial,
                    "docs": agg["docs"],
                    "tokens": int(agg["tokens"]),
                    "bytes_per_token": round(agg["bytes"] / agg["tokens"], 2),
                    "recon_all_ok": agg["recon"] == 1,
                    "wall_s": round(wall, 2),
                    "docs_per_s": round(agg["docs"] / wall),
                    "mtokens_per_s": round(agg["tokens"] / wall / 1e6, 2),
                }
            ),
            flush=True,
        )

    # token-budget packing: UDF counts -> salted epoch order -> prefix sum
    keyed = st.select("url", "n_bpe_tokens").withColumn(
        "ok", md5_hash60(F.concat(F.lit("ep1:"), F.col("url")))
    )
    t0 = time.perf_counter()
    packed = pack_shards(keyed, ["ok", "url"], "n_bpe_tokens", 1 << 21)
    n_shards, n_rows = packed.agg(
        F.countDistinct("shard_id"), F.count("*")
    ).first()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": "pack_token_shards",
                "rows": n_rows,
                "shards": n_shards,
                "wall_s": round(wall, 2),
                "rows_per_s": round(n_rows / wall),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
