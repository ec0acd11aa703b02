#!/usr/bin/env python
"""Single-core sketch microbenchmarks — the apples-to-apples comparison
against the reference's published per-op numbers (BASELINE.md: 18.6 M
inserts/s, 35.8 M lookups/s at 1M elements / FPR 0.01, Go + AVX2).

Our per-op path is vectorized numpy over Arrow-style batches, so the
honest unit is keys/sec at a given batch size, single thread.  Writes
MICROBENCH.md.

Usage: python scripts/microbench.py [--n 1000000] [--batch 8192]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomfilter_spark.sketches.bloom import BloomFilter  # noqa: E402
from bloomfilter_spark.sketches.cms import CountMinSketch  # noqa: E402
from bloomfilter_spark.sketches.hll import HyperLogLog  # noqa: E402
from bloomfilter_spark.sketches.kll import KLLSketch  # noqa: E402
from bloomfilter_spark.sketches.tdigest import TDigest  # noqa: E402


def _mp_worker(args) -> float:
    n, bs = args
    keys = np.arange(n, dtype=np.int64)
    bf = BloomFilter.create(max(n, 1024), 0.01)
    t0 = time.perf_counter()
    for i in range(0, n, bs):
        bf.update(keys[i : i + bs])
    bf.words  # fold the staging buffer — end-state cost belongs in the time
    return time.perf_counter() - t0


def bench(fn, total: int, repeat: int = 3) -> float:
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return total / best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args()
    n, bs = args.n, args.batch

    # int keys (the reference's AddUint64 analog) and string keys (urls)
    int_keys = np.arange(n, dtype=np.int64)
    str_keys = pd.Series([f"https://site{i % 997}.example.com/p{i}" for i in range(n)])
    int_batches = [int_keys[i : i + bs] for i in range(0, n, bs)]
    str_batches = [str_keys.iloc[i : i + bs] for i in range(0, n, bs)]
    floats = np.random.RandomState(0).lognormal(6.5, 1.0, n)
    float_batches = [floats[i : i + bs] for i in range(0, n, bs)]

    results: dict[str, float] = {}

    bf = BloomFilter.create(n, 0.01)
    results["bloom add (int64)"] = bench(
        lambda: ([bf.update(b) for b in int_batches], bf.words), n
    )
    results["bloom contains (int64, all present)"] = bench(
        lambda: [bf.contains(b) for b in int_batches], n
    )
    # the miss-heavy workload is where Bloom probes earn their keep
    # (anti-join / decontamination): the lane-at-a-time probe early-outs
    # on the first zero lane, ~2 gathers per miss instead of k
    neg_keys = np.arange(n, 2 * n, dtype=np.int64)
    neg_batches = [neg_keys[i : i + bs] for i in range(0, n, bs)]
    results["bloom contains (int64, all absent)"] = bench(
        lambda: [bf.contains(b) for b in neg_batches], n
    )
    bf2 = BloomFilter.create(n, 0.01)
    results["bloom add (url str)"] = bench(
        lambda: ([bf2.update(b) for b in str_batches], bf2.words), n
    )
    results["bloom contains (url str, present)"] = bench(
        lambda: [bf2.contains(b) for b in str_batches], n
    )
    neg = pd.Series([f"neg-{i}" for i in range(100_000)])
    fp = float(bf2.contains(neg).mean())

    hll = HyperLogLog(p=14)
    results["hll add (int64)"] = bench(
        lambda: [hll.update(b) for b in int_batches], n
    )
    cms = CountMinSketch.create(0.0005, 0.001)
    results["cms add (int64)"] = bench(
        lambda: [cms.update(b) for b in int_batches], n
    )
    kll = KLLSketch(k=200)
    results["kll add (float64)"] = bench(
        lambda: [kll.update(b) for b in float_batches], n
    )
    td = TDigest(delta=200)
    results["tdigest add (float64)"] = bench(
        lambda: [td.update(b) for b in float_batches], n
    )

    # multi-process aggregate (the reference's concurrent-writes analog:
    # its lock-free CAS hits 14-23 M ops/s at 50 goroutines; our model is
    # partition-private filters, so workers don't contend at all)
    import multiprocessing as mp

    # each worker gets a full 1M-key build so the wall is seconds, not
    # milliseconds — n//procs slices were noise-dominated (4 ms at 32 procs)
    n_w = 1_000_000
    agg = {}
    for procs in (8, 32):
        with mp.Pool(procs) as pool:
            t0 = time.perf_counter()
            pool.map(_mp_worker, [(n_w, bs)] * procs)
            agg[procs] = n_w * procs / (time.perf_counter() - t0)

    # merge throughput: OR of two 1%-FPP filters for n keys
    a, b = BloomFilter.create(n, 0.01), BloomFilter.create(n, 0.01)
    m_bytes = a.words.nbytes
    merges = 200
    t0 = time.perf_counter()
    for _ in range(merges):
        a.merge(b)
    mb_s = merges * m_bytes / (time.perf_counter() - t0) / 1e6

    lines = [
        "# MICROBENCH — single-core sketch ops (vs reference BASELINE.md)",
        "",
        f"n = {n:,} keys, batch = {bs}, numpy {np.__version__}, single thread.",
        "Reference (Go + AVX2, i9-13980HX): 18.6 M inserts/s, 35.8 M lookups/s",
        "at the same 1M-element / 1% FPP config (BASELINE.md).",
        "",
        "| op | keys/sec |",
        "|---|---|",
    ]
    for k, v in results.items():
        lines.append(f"| {k} | {v / 1e6:.2f} M |")
    lines += [
        f"| bloom union (bitwise OR) | {mb_s:,.0f} MB/s |",
        f"| bloom add aggregate, 8 procs | {agg[8] / 1e6:.1f} M/s |",
        f"| bloom add aggregate, 32 procs | {agg[32] / 1e6:.1f} M/s |",
        "",
        "Aggregate rows use partition-private filters (our concurrency",
        "model — no shared state, no CAS); the reference's lock-free",
        "shared filter reports 14-23 M concurrent writes/s at 50",
        "goroutines (BASELINE.md).",
        "",
        f"Observed FPP on 100k never-inserted probes: {fp:.4f} (configured 0.01).",
        "",
        "Contains is lane-at-a-time with candidate compaction: a miss",
        "early-outs on its first zero lane (~2 gathers instead of k), so",
        "the all-absent rate is the operative one for anti-join /",
        "decontamination probes.  The all-present rate is near numpy's",
        "floor for this op: the pinned position semantics (uint64-wrapped",
        "h1+i*h2, then mod m) require a true 64-bit division per lane,",
        "which blocks the reciprocal-multiply tricks AVX2 ports use.",
        "",
        "Single-batch-size caveat: the reference's ns/op numbers are a",
        "hot-loop per-key measurement; ours amortize one numpy dispatch per",
        f"{bs}-key batch, which is exactly how keys arrive from Arrow in the",
        "distributed path.",
    ]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(__file__), "../MICROBENCH.md"), "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
