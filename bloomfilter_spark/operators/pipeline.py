"""One-scan multi-sketch build pipeline over the `pages` table.

At 100 TB the scan dominates: reading the table once per sketch would be a
5-7× waste.  This pipeline folds ALL the suite's sketches (Bloom over url,
HLL over url/host, CMS over host/lang, Misra-Gries heavy-hitter hosts,
KLL + t-digest over text length) into
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
    dds_factory,
    freqitems_factory,
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


def _fold_partition(
    batches,
    names: list[str],
    factories: dict[str, Callable[[], object]],
    col_of: dict[str, str],
) -> tuple[dict[str, object], int]:
    """Fold one partition's Arrow batches into all the suite's sketches.

    Batches are raw `pyarrow.RecordBatch`es (mapInArrow): the hash kernels
    read the Arrow string/binary buffers zero-copy, so skipping the
    Arrow→pandas object conversion removes the biggest fixed cost of the
    string path (~25% of suite-build wall).

    Hash sharing: sketches on the same column with the same seed all
    consume one murmur3 pass (update() is just hash_any + add_hashes)."""
    import numpy as np

    from bloomfilter_spark.functions.hashing import hash_any

    sks = {n: factories[n]() for n in names}
    by_col: dict[str, list] = {}
    for n in names:
        by_col.setdefault(col_of[n], []).append(sks[n])
    rows = 0
    for rb in batches:
        for c, col_sks in by_col.items():
            clean = rb.column(rb.schema.get_field_index(c)).drop_null()
            hash_cache: dict[int, tuple] = {}
            for sk in col_sks:
                if hasattr(sk, "add_hashes") and hasattr(sk, "seed"):
                    seed = int(sk.seed)
                    if seed not in hash_cache:
                        hash_cache[seed] = hash_any(clean, seed)
                    sk.add_hashes(*hash_cache[seed])
                elif hasattr(sk, "update_arrow"):
                    # frequent-items: raw-key fold via pyarrow value_counts
                    sk.update_arrow(clean)
                else:
                    # KLL/t-digest numeric fold — same value stream as the
                    # pandas path (drop nulls, cast float64)
                    sk.update(
                        np.asarray(
                            clean.to_numpy(zero_copy_only=False),
                            dtype="float64",
                        )
                    )
        rows += rb.num_rows
    return sks, rows


def build_multi(
    df: DataFrame,
    specs: dict[str, tuple[str, Callable[[], object]]],
    fanin: int | None = None,
    return_rows: bool = False,
) -> dict[str, object] | tuple[dict[str, object], int]:
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

    def build_iter(batches):
        import pyarrow as pa

        from pyspark import TaskContext

        sks, rows = _fold_partition(batches, names, factories, col_of)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        out = {"partition_id": [pid]}
        out.update({n: [_pack(sks[n])] for n in names})
        out["rows"] = [rows]
        yield pa.RecordBatch.from_pydict(out)

    partials = pruned.mapInArrow(build_iter, schema=schema)
    n_parts = pruned.rdd.getNumPartitions()
    par = df.sparkSession.sparkContext.defaultParallelism
    return _merge_tree(
        partials, schema, names, factories, n_parts, fanin, par,
        return_rows=return_rows,
    )


def build_multi_checkpointed(
    df: DataFrame,
    specs: dict[str, tuple[str, Callable[[], object]]],
    ckpt_dir: str,
    fanin: int | None = None,
    fail_on: Callable[[int], bool] | None = None,
    input_pin: str | None = None,
):
    """`build_multi` with per-partition checkpoint/resume — the north-rule
    resume contract on the path that actually runs at 100 TB (a killed
    8-sketch suite build must NOT rescan completed splits).

    Each task atomically writes `partial-<pid>.bin` (all of its sketches'
    zlib partial blobs in one file) plus a lineage sidecar; on resume a task
    whose partial exists yields stats WITHOUT consuming its input iterator,
    so the parquet split is never read.  The merge stage reloads the
    partials as a DataFrame (binaryFile source — never a driver glob-read
    of 800k blobs) and reduces them through the same deterministic
    bounded-fan-in tree as build_multi, so an interrupted-then-resumed
    build is bit-identical to an uninterrupted one.

    Returns (name -> merged sketch, lineage DataFrame).  Same caller
    contract as build_sketch_checkpointed: deterministic input partitioning
    across runs, ckpt_dir on shared storage.

    input_pin: opaque identifier of the immutable input version — for an
    Iceberg source, the snapshot id (sources.tables.current_snapshot_id);
    for parquet, e.g. the path + file count.  It is recorded in the
    checkpoint MANIFEST, and a resume whose pin differs is REJECTED — this
    is what makes the resume contract's "input must not change between
    runs" requirement enforceable instead of advisory (an Iceberg append
    between kill and resume would otherwise silently produce a sketch
    built over a mix of two snapshots).
    """
    import json
    import os
    import pickle
    import time

    from bloomfilter_spark.operators.checkpoint import (
        STATS_SCHEMA,
        _atomic_write,
    )
    from bloomfilter_spark.plans.skew import ensure_parallelism

    names = list(specs)
    cols = sorted({c for c, _ in specs.values()})
    pruned = ensure_parallelism(df.select(*cols))
    factories = {n: f for n, (_, f) in specs.items()}
    col_of = {n: c for n, (c, _) in specs.items()}
    n_parts = pruned.rdd.getNumPartitions()

    os.makedirs(ckpt_dir, exist_ok=True)
    # merge_par pins the ADAPTIVE merge-tree shape: fanin=None sizes each
    # reduce round from the cluster parallelism, so without recording it a
    # build killed on N cores and resumed on 4N would merge the SAME
    # partials through a different tree — compaction sketches
    # (KLL/t-digest) would then NOT be bit-identical to the uninterrupted
    # build, silently breaking the resume contract the manifest enforces
    merge_par = df.sparkSession.sparkContext.defaultParallelism
    manifest = {
        "cols": cols,
        "n_parts": n_parts,
        "input_pin": input_pin,
        "merge_par": merge_par,
        "sketches": {
            n: [col_of[n], factories[n]().to_bytes()[:64].hex()] for n in names
        },
    }
    man_path = os.path.join(ckpt_dir, "MANIFEST.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            prev = json.load(f)
        # a checkpoint written before input_pin existed is pin-less, not
        # mismatched — don't orphan an in-flight build across the upgrade
        prev.setdefault("input_pin", None)
        prev.setdefault("merge_par", merge_par)
        # the recorded merge_par WINS on resume (that's the pin); it is
        # excluded from the identity check — a new cluster size is a
        # legitimate resume, a different input/sketch geometry is not
        merge_par = int(prev["merge_par"])
        if {k: v for k, v in prev.items() if k != "merge_par"} != {
            k: v for k, v in manifest.items() if k != "merge_par"
        }:
            raise ValueError(
                "checkpoint dir was written by a different suite build "
                f"(manifest {prev} != {manifest}); use a fresh ckpt_dir"
            )
    else:
        _atomic_write(man_path, json.dumps(manifest).encode())

    def build_iter(batches):
        import pyarrow as pa

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        blob_path = os.path.join(ckpt_dir, f"partial-{pid:06d}.bin")
        if os.path.exists(blob_path):
            # resume fast-path: input iterator NOT consumed → split not read
            yield pa.RecordBatch.from_pydict(
                {
                    "partition_id": [pid],
                    "rows": [-1],
                    "input_bytes": [-1],
                    "wall_ms": [0.0],
                    "resumed": [True],
                }
            )
            return
        if fail_on is not None and fail_on(pid):
            raise RuntimeError(f"injected failure in partition {pid}")
        t0 = time.perf_counter()
        nbytes = 0

        def counted(bs):
            nonlocal nbytes
            for rb in bs:
                nbytes += int(rb.nbytes)
                yield rb

        sks, rows = _fold_partition(counted(batches), names, factories, col_of)
        wall_ms = (time.perf_counter() - t0) * 1000.0
        payload = pickle.dumps(
            {"rows": rows, "blobs": {n: _pack(sks[n]) for n in names}},
            protocol=4,
        )
        _atomic_write(blob_path, payload)
        _atomic_write(
            os.path.join(ckpt_dir, f"lineage-{pid:06d}.json"),
            json.dumps(
                {
                    "partition_id": pid,
                    "rows": rows,
                    "wall_ms": wall_ms,
                    "cols": cols,
                    "sketches": names,
                    "completed_at": time.time(),
                }
            ).encode(),
        )
        yield pa.RecordBatch.from_pydict(
            {
                "partition_id": [pid],
                "rows": [rows],
                "input_bytes": [nbytes],
                "wall_ms": [wall_ms],
                "resumed": [False],
            }
        )

    stats_pdf = (
        pruned.mapInArrow(build_iter, schema=STATS_SCHEMA).toPandas()
    )  # runs the job; raises if a task fails

    done = [
        f for f in os.listdir(ckpt_dir)
        if f.startswith("partial-") and f.endswith(".bin")
    ]
    if len(done) != n_parts:
        raise RuntimeError(
            f"checkpoint incomplete: {len(done)}/{n_parts} partials present"
        )

    blob_cols = ", ".join(f"`{n}` binary" for n in names)
    schema = f"partition_id long, {blob_cols}, rows long"
    spark = df.sparkSession
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "partial-*.bin")
        .load(ckpt_dir)
        .select("path", "content")
    )

    def parse_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols_out = ["partition_id", *names, "rows"]
        for pdf in batches:
            recs = []
            for path, content in zip(pdf["path"], pdf["content"]):
                d = pickle.loads(bytes(content))
                pid = int(os.path.basename(path)[len("partial-"):-len(".bin")])
                rec = {"partition_id": pid, "rows": d["rows"]}
                rec.update(d["blobs"])
                recs.append(rec)
            yield pd.DataFrame(recs, columns=cols_out)

    partials = files.mapInPandas(parse_iter, schema=schema)
    # merge_par from the MANIFEST, not the live cluster: the tree shape
    # must match the original build's for bit-identical resumes
    merged = _merge_tree(
        partials, schema, names, factories, n_parts, fanin, merge_par
    )
    lineage = spark.createDataFrame(stats_pdf, schema=STATS_SCHEMA)
    return merged, lineage


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
    return_rows: bool = False,
) -> dict[str, object] | tuple[dict[str, object], int]:
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
    merged = _nary_merge_pdf(final_pdf, names, factories)
    if return_rows:
        return merged, int(final_pdf["rows"].sum())
    return merged


# ---------------------------------------------------------------------------
# The pages suite: every sketch family over the north-rule input in one scan
# ---------------------------------------------------------------------------


def pages_suite_specs(
    n_expected: int, prehash: bool = False
) -> dict[str, tuple[str, Callable]]:
    """Suite spec: name -> (feature column, sketch factory).

    prehash=True is the 100 TB scale path: the url-keyed membership /
    cardinality / count sketches consume a JVM-computed `xxhash64(url)`
    (and `xxhash64(host)`) instead of the raw string, so the Arrow batch
    ships an 8-byte int per row where the default ships the whole url, and
    the Python fold runs the fixed-8-byte murmur kernel (~2x the
    variable-length string rate, MICROBENCH).  Correctness: a 64-bit
    prehash can never create a false NEGATIVE (equal keys hash equal); it
    adds at most ~n²/2⁶⁵ false-positive mass from prehash collisions
    (≈1e-7 at n=2M — three orders below the 1% FPP budget), and HLL/CMS
    already hash internally so their error model is unchanged.  freq_host
    stays on the raw string (Misra-Gries must report host NAMES, not
    hashes); cms_lang stays raw (a handful of 2-byte codes).  Probes
    against a prehashed suite must apply the same `F.xxhash64(col)`
    JVM-side — see tests/test_pages.py::test_build_suite_prehashed."""
    url_key = "url_h" if prehash else "url"
    host_key = "host_h" if prehash else "host"
    return {
        "bloom_url": (url_key, bloom_factory(max(1024, n_expected), 0.01)),
        # "has this text been seen" (north star: url/text-hash membership);
        # the 64-bit text hash is computed JVM-side, the Bloom hashes its
        # 8-byte LE form (the reference's AddUint64 byte-collapse)
        "bloom_texthash": ("text_hash", bloom_factory(max(1024, n_expected), 0.01)),
        "hll_url": (url_key, hll_factory(precision=14)),
        "hll_host": (host_key, hll_factory(precision=14)),
        "cms_host": (host_key, cms_factory(epsilon=0.0005, delta=0.001)),
        "cms_lang": ("lang", cms_factory(epsilon=0.0005, delta=0.001)),
        # heavy-hitter hosts WITHOUT a candidate set (north star: the CMS
        # scores hosts you already suspect; MG surfaces them from the scan)
        "freq_host": ("host", freqitems_factory(4096)),
        "kll_textlen": ("text_len", kll_factory(k=200)),
        "tdigest_textlen": ("text_len", tdigest_factory(delta=200)),
        # relative-error text-length quantiles: commutative histogram, so
        # this one rides the fast merge path AND is SQL-replayable exactly
        "dds_textlen": ("text_len", dds_factory(alpha=0.01)),
    }


def with_page_features(df: DataFrame, prehash: bool = False) -> DataFrame:
    """Derive host + text_len JVM-side (Catalyst, codegen) so the Python
    workers only ever see the exact columns each sketch consumes.

    prehash=True additionally computes xxhash64(url)/xxhash64(host) in the
    same codegen stage and DROPS the url string from the projection — the
    single widest column the Arrow boundary would otherwise ship."""
    base = df.select(
        "url",
        "lang",
        # no trailing-slash requirement: a bare-domain url
        # ('https://example.com') must keep its host — requiring '/'
        # would lump every such url under host '' in the host sketches
        F.regexp_extract("url", r"^https?://([^/?#]+)", 1).alias("host"),
        F.length("text").alias("text_len"),
        F.xxhash64("text").alias("text_hash"),
    )
    if not prehash:
        return base
    return base.select(
        F.xxhash64("url").alias("url_h"),
        "host",
        F.xxhash64("host").alias("host_h"),
        "lang",
        "text_len",
        "text_hash",
    )


def build_suite(
    df: DataFrame,
    n_expected: int | None = None,
    fanin: int | None = None,
    prehash: bool = False,
) -> dict[str, object]:
    """Full sketch suite over a pages DataFrame in one scan.

    Pass n_expected when df is filtered/derived: the fallback count() is
    metadata-only on plain parquet but a real extra scan on a filtered or
    snapshot-pinned input.  Upper bounds are safe (Bloom just runs at a
    lower FPP).

    prehash=True keys the url/host sketches on JVM-side xxhash64 values
    (see pages_suite_specs) — the high-throughput layout for corpus-scale
    builds; the default keeps raw-byte keys for reference parity."""
    if n_expected is None:
        n_expected = df.count()
    feats = with_page_features(df, prehash=prehash)
    return build_multi(
        feats, pages_suite_specs(n_expected, prehash=prehash), fanin=fanin
    )
