#!/usr/bin/env python
"""Scale measurements for the round-4 additions: SRP-LSH embedding
near-dup, windowed (generational-ring) streaming dedup, skew_report,
and the sparse-HLL grouped-rollup blob width.  One JSON line per op;
paste into BENCH.md.  Run on a QUIET box.

All inputs are synthesized deterministically in-Spark (no RNG state,
no external data): vectors/events derive from xxhash64 of the row id,
so any run reproduces the same bytes.

Usage: python scripts/r4_ops_scale_bench.py [n_vectors] [n_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bloomfilter_spark.plans.session import get_spark  # noqa: E402


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    wall = time.perf_counter() - t0
    if "rows" in out:
        out["rows_per_s"] = round(out["rows"] / wall)
    print(json.dumps({"op": name, "wall_s": round(wall, 2), **out}), flush=True)


def synth_embeddings(spark, n: int, dim: int = 64, dup_every: int = 10):
    """n base vectors (uniform-ish from xxhash64) + a perturbed near-dup
    for every dup_every-th id — the planted-pair workload of the catalog
    entry at 400x its sf0.1 size."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {dim - 1}), "
            "j -> cast(pmod(xxhash64(id, j), 100000) as double) / 50000.0 - 1.0)"
        ).alias("embedding"),
    )
    pert = base.filter(F.col("vec_id") % dup_every == 0).select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> x + 0.02 * sin(1000.0 * x))"
        ).alias("embedding"),
    )
    return base.unionByName(pert)


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_ev = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark(app_name="r4_ops_scale_bench")

    # --- SRP-LSH near-dup: planted pairs at high threshold -----------------
    if n_vec > 0:  # pass 0 to skip (already measured)
        from bloomfilter_spark.operators.ann import neardup_srp_verified

        emb = synth_embeddings(spark, n_vec).localCheckpoint(eager=True)
        total = emb.count()
        planted = n_vec // 10

        def run_srp():
            pairs = neardup_srp_verified(emb, threshold=0.9).count()
            return {
                "rows": total,
                "pairs": pairs,
                "planted": planted,
                "recall_vs_planted": round(pairs / planted, 4),
            }

        timed("srp_neardup_0.9", run_srp)

    # --- windowed streaming dedup over 2M synthetic events -----------------
    import shutil
    import tempfile

    from bloomfilter_spark.streaming.stateful import streaming_first_seen_windowed

    n_users = 50_000
    ev = spark.range(n_ev).select(
        F.col("id").alias("event_id"),
        # 60 days of event time, in id order so staged files are time-ordered
        F.expr(
            "timestampadd(SECOND, "
            f"cast(id * {60 * 86400 / n_ev} as long), "
            "timestamp'2024-01-01 00:00:00')"
        ).alias("ts"),
        # heavy-head skew: user = floor(u^16 * n) puts ~half the stream on
        # user 0 (P[u^16 < 1/n] = n^(-1/16) ≈ 0.51 at n = 50k) — the hot
        # host shape skew_report exists to measure
        F.expr(
            f"cast(pow(pmod(xxhash64(id), 1000000) / 1000000.0, 16)"
            f" * {n_users} as long)"
        ).alias("user_id"),
    )

    def run_windowed():
        work = tempfile.mkdtemp(prefix="bfs_r4win_")
        try:
            nb = 6
            bounds = [int(i * n_ev / nb) for i in range(nb + 1)]
            for i in range(nb):
                ev.filter(
                    (F.col("event_id") >= bounds[i])
                    & (F.col("event_id") < bounds[i + 1])
                ).coalesce(4).write.mode("append").parquet(f"{work}/src")
            schema = spark.read.parquet(f"{work}/src").schema
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "4")
                .parquet(f"{work}/src")
            )
            q = (
                streaming_first_seen_windowed(
                    stream,
                    "user_id",
                    "ts",
                    window_sec=86400,
                    n_expected_per_window=2 * n_users,
                    fpp=1e-4,
                    n_shards=32,
                    order_cols=["ts", "event_id"],
                )
                .writeStream.format("noop")
                .option("checkpointLocation", f"{work}/ck")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            prog = q.lastProgress
            emitted = prog["sink"].get("numOutputRows", -1) if prog else -1
            return {"rows": n_ev, "users": n_users, "emitted_last_batch": emitted}
        finally:
            shutil.rmtree(work, ignore_errors=True)

    timed("windowed_dedup_daily", run_windowed)

    # --- skew_report over a Zipf key ---------------------------------------
    from bloomfilter_spark.plans.skew import skew_report

    def run_skew():
        rep = skew_report(ev, "user_id", num_partitions=32, top=20).collect()
        return {
            "rows": n_ev,
            "hottest_share": rep[0]["share"],
            "hottest_salts": rep[0]["suggested_salts"],
        }

    timed("skew_report", run_skew)

    # --- sparse-HLL grouped rollup blob width ------------------------------
    from bloomfilter_spark.operators.build import build_grouped, hll_factory

    n_groups = 100_000

    def run_rollup():
        grouped = ev.select(
            F.pmod(F.xxhash64("event_id"), F.lit(n_groups)).alias("g"),
            "user_id",
        )
        blobs = build_grouped(grouped, "g", "user_id", hll_factory(14))
        stats = blobs.select(
            F.count("*").alias("groups"),
            F.avg(F.length("blob")).alias("avg_blob_b"),
            F.max(F.length("blob")).alias("max_blob_b"),
        ).collect()[0]
        dense = (1 << 14) + 28  # registers + SKB1 header/params
        return {
            "rows": n_ev,
            "groups": int(stats["groups"]),
            "avg_blob_b": round(stats["avg_blob_b"], 1),
            "max_blob_b": int(stats["max_blob_b"]),
            "dense_blob_b": dense,
            "shuffle_width_ratio": round(dense / stats["avg_blob_b"], 1),
        }

    timed("hll_rollup_sparse_blobs", run_rollup)

    spark.stop()


if __name__ == "__main__":
    main()
