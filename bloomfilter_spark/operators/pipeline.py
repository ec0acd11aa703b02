"""One-scan multi-sketch build pipeline over the `pages` table.

At 100 TB the scan dominates: reading the table once per sketch would be a
5-7× waste.  This pipeline folds ALL the suite's sketches (Bloom over url,
HLL over url/host, CMS over host/lang, KLL + t-digest over text length) into
a single `mapInPandas` pass — one parquet scan, one JVM→Python Arrow hop —
then reduces the per-partition partial blobs with a deterministic bounded
fan-in merge tree:

  round k: bucket = partition_id // fanin, applyInPandas n-ary merge per
           bucket (blobs merged in sorted partition_id order)
  final:   ≤ fanin rows collected, driver n-ary merge in sorted order

The tree never materializes more than `fanin` blobs in one task and never
ships all P partials to the driver (P ≈ 800k at 100 TB / 128 MB splits), and
bucket composition + intra-bucket order are pure functions of partition_id —
so the result is identical regardless of task scheduling, which is how the
merge-order-sensitive compaction sketches (KLL, t-digest — see
sketches/kll.py) stay deterministic.  Commutative sketches (Bloom OR / HLL
max / CMS sum) are bit-identical under any merge order anyway
(/root/reference/bloomfilter.go:209-213 union semantics).
"""

from __future__ import annotations

import math
import zlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from bloomfilter_spark.operators.build import (
    bloom_factory,
    cms_factory,
    hll_factory,
    kll_factory,
    tdigest_factory,
    _numeric_update,
)
from bloomfilter_spark.sketches import serde

DEFAULT_FANIN = 64

# Partial blobs are sparse (a P-partition build puts ~1/P of the keys in
# each partial ⇒ low bit/counter density) and compress 10-20×; the merge
# tree would otherwise move P × m bytes of mostly-zero words.  zlib level 1
# costs ~ms per blob and is deterministic.


def _pack(sketch) -> bytes:
    return zlib.compress(sketch.to_bytes(), 1)


def _unpack(blob: bytes):
    return serde.deserialize(zlib.decompress(blob))


def build_multi(
    df: DataFrame,
    specs: dict[str, tuple[str, Callable[[], object]]],
    fanin: int | None = None,
) -> dict[str, object]:
    """Build many sketches in ONE scan.

    specs: name -> (column, factory).  Returns name -> merged sketch.
    fanin=None auto-sizes the merge tree: the first reduce round makes
    ~2×parallelism buckets so every core merges, instead of a handful of
    fat tasks serializing the reduction.
    """
    from bloomfilter_spark.plans.skew import ensure_parallelism

    names = list(specs)
    cols = sorted({c for c, _ in specs.values()})
    pruned = ensure_parallelism(df.select(*cols))
    factories = {n: f for n, (_, f) in specs.items()}
    col_of = {n: c for n, (c, _) in specs.items()}

    blob_cols = ", ".join(f"`{n}` binary" for n in names)
    schema = f"partition_id long, {blob_cols}, rows long"

    def build_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from bloomfilter_spark.functions.hashing import hash_any

        sks = {n: factories[n]() for n in names}
        # hash sharing: sketches on the same column with the same seed all
        # consume one murmur3 pass (update() is just hash_any + add_hashes)
        by_col: dict[str, list] = {}
        for n in names:
            by_col.setdefault(col_of[n], []).append(sks[n])
        rows = 0
        for pdf in batches:
            for c, col_sks in by_col.items():
                clean = pdf[c].dropna()
                hash_cache: dict[int, tuple] = {}
                for sk in col_sks:
                    if hasattr(sk, "add_hashes") and hasattr(sk, "seed"):
                        seed = int(sk.seed)
                        if seed not in hash_cache:
                            hash_cache[seed] = hash_any(clean, seed)
                        sk.add_hashes(*hash_cache[seed])
                    else:
                        _numeric_update(sk, pdf[c])
            rows += len(pdf)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        out = {"partition_id": [pid]}
        out.update({n: [_pack(sks[n])] for n in names})
        out["rows"] = [rows]
        yield pd.DataFrame(out)

    partials = pruned.mapInPandas(build_iter, schema=schema)
    n_parts = pruned.rdd.getNumPartitions()
    par = df.sparkSession.sparkContext.defaultParallelism
    return _merge_tree(partials, schema, names, factories, n_parts, fanin, par)


def _nary_merge_pdf(
    pdf: pd.DataFrame, names: list[str], factories: dict
) -> dict[str, object]:
    """Merge one bucket of partial rows, sorted by partition_id (canonical
    order — determinism for compaction sketches)."""
    pdf = pdf.sort_values("partition_id")
    out = {}
    for n in names:
        acc = factories[n]()
        parts = [_unpack(b) for b in pdf[n]]
        if hasattr(acc, "merge_all"):
            acc.merge_all(parts)
        else:
            for p in parts:
                acc.merge(p)
        out[n] = acc
    return out


def _merge_tree(
    partials: DataFrame,
    schema: str,
    names: list[str],
    factories: dict,
    n_parts: int,
    fanin: int | None,
    parallelism: int = 32,
) -> dict[str, object]:
    """Bounded-fan-in reduction of partial blobs.

    fanin=None (adaptive): each reduce round uses the smallest fan-in that
    still makes ≤ 2×parallelism buckets (so the round spreads over every
    core), floored at 8 and capped at DEFAULT_FANIN; rounds repeat until ≤
    DEFAULT_FANIN rows remain for the driver.  An explicit fanin gives a
    fixed-shape tree (tests use fanin=2 to force depth).
    """
    level = partials
    remaining = n_parts
    final_fanin = fanin if fanin is not None else DEFAULT_FANIN
    while remaining > final_fanin:
        if fanin is None:
            step = min(
                DEFAULT_FANIN,
                max(8, math.ceil(remaining / max(1, 2 * parallelism))),
            )
        else:
            step = fanin

        def make_merge_bucket(step: int):
            # applyInPandas gives single-arg callables the group pdf; the
            # factory pins this round's `step` (no late binding)
            def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.drop(columns=["_bucket"])
                merged = _nary_merge_pdf(pdf, names, factories)
                out = {"partition_id": [int(pdf["partition_id"].min()) // step]}
                out.update({n: [_pack(merged[n])] for n in names})
                out["rows"] = [int(pdf["rows"].sum())]
                return pd.DataFrame(out)

            return merge_bucket

        level = (
            level.withColumn("_bucket", (F.col("partition_id") / step).cast("long"))
            .groupBy("_bucket")
            .applyInPandas(make_merge_bucket(step), schema=schema)
        )
        remaining = math.ceil(remaining / step)

    final_pdf = level.toPandas()
    return _nary_merge_pdf(final_pdf, names, factories)


# ---------------------------------------------------------------------------
# The pages suite: every sketch family over the north-rule input in one scan
# ---------------------------------------------------------------------------


def pages_suite_specs(n_expected: int) -> dict[str, tuple[str, Callable]]:
    return {
        "bloom_url": ("url", bloom_factory(max(1024, n_expected), 0.01)),
        # "has this text been seen" (north star: url/text-hash membership);
        # the 64-bit text hash is computed JVM-side, the Bloom hashes its
        # 8-byte LE form (the reference's AddUint64 byte-collapse)
        "bloom_texthash": ("text_hash", bloom_factory(max(1024, n_expected), 0.01)),
        "hll_url": ("url", hll_factory(precision=14)),
        "hll_host": ("host", hll_factory(precision=14)),
        "cms_host": ("host", cms_factory(epsilon=0.0005, delta=0.001)),
        "cms_lang": ("lang", cms_factory(epsilon=0.0005, delta=0.001)),
        "kll_textlen": ("text_len", kll_factory(k=200)),
        "tdigest_textlen": ("text_len", tdigest_factory(delta=200)),
    }


def with_page_features(df: DataFrame) -> DataFrame:
    """Derive host + text_len JVM-side (Catalyst, codegen) so the Python
    workers only ever see the exact columns each sketch consumes."""
    return df.select(
        "url",
        "lang",
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host"),
        F.length("text").alias("text_len"),
        F.xxhash64("text").alias("text_hash"),
    )


def build_suite(
    df: DataFrame, n_expected: int | None = None, fanin: int | None = None
) -> dict[str, object]:
    """Full sketch suite over a pages DataFrame in one scan."""
    if n_expected is None:
        n_expected = df.count()
    feats = with_page_features(df)
    return build_multi(feats, pages_suite_specs(n_expected), fanin=fanin)
