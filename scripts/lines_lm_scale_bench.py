#!/usr/bin/env python
"""Scale measurements for the round-4 text-pipeline additions:
duplicate-LINE removal (operators/linededup.py) and bigram-LM perplexity
scoring (operators/lm.py) over the cached 2M-row Common-Crawl-style pages
table.  One JSON line per op; paste into BENCH.md.  Run on a QUIET box.

Usage: python scripts/lines_lm_scale_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bloomfilter_spark.plans.session import get_spark  # noqa: E402


def _reflowed(df, width: int = 8):
    """Pages text is single-line by construction; reflow each page into
    `width`-token lines (same deterministic rule as the catalog query) so
    line-dedup sees a realistic multi-line web document."""
    toks = F.split(F.lower(F.trim("text")), r"[ \t\n\f\r]+")
    nl = F.ceil(F.size(toks) / F.lit(float(width))).cast("int")
    return df.select(
        "url",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(0), F.greatest(nl, F.lit(1)) - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * width + 1, width)
                ),
            ),
        ).alias("text"),
    )


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from bloomfilter_spark.operators.linededup import remove_duplicate_lines
    from bloomfilter_spark.operators.lm import fit_bigram_lm, perplexity_score
    from bloomfilter_spark.sources.pages import ensure_pages

    spark = get_spark(app_name="lines_lm_scale_bench")
    pages = spark.read.parquet(ensure_pages(spark, n_pages)).select(
        "url", "text", "lang"
    )

    # -- duplicate-line removal over the reflowed corpus ------------------
    lines_in = _reflowed(pages.filter("text IS NOT NULL"))
    for trial in range(2):
        t0 = time.perf_counter()
        agg = remove_duplicate_lines(lines_in, "url", "text", min_docs=2).agg(
            F.count("*").alias("docs"),
            F.sum("n_lines").alias("lines"),
            F.sum("n_removed").alias("removed"),
        ).first()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "line_dedup_removal",
                    "trial": trial,
                    "docs": int(agg["docs"]),
                    "lines": int(agg["lines"]),
                    "removed_lines": int(agg["removed"]),
                    "wall_s": round(wall, 2),
                    "docs_per_s": int(agg["docs"] / wall),
                    "lines_per_s": int(agg["lines"] / wall),
                }
            ),
            flush=True,
        )

    # -- bigram-LM fit on the en slice + score everything -----------------
    ref = pages.filter(F.col("lang") == "en")
    for trial in range(2):
        t0 = time.perf_counter()
        lm = fit_bigram_lm(ref, "text")
        scored = perplexity_score(pages, "url", "text", lm)
        agg = scored.agg(
            F.count("*").alias("docs"),
            F.sum("n_scored").alias("bigrams"),
            F.round(F.avg("ppl"), 2).alias("mean_ppl"),
        ).first()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "lm_perplexity",
                    "trial": trial,
                    "docs": int(agg["docs"]),
                    "bigrams_scored": int(agg["bigrams"]),
                    "mean_ppl": float(agg["mean_ppl"]),
                    "wall_s": round(wall, 2),
                    "docs_per_s": int(agg["docs"] / wall),
                    "tokens_per_s": int(agg["bigrams"] / wall),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
