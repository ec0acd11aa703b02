"""Deterministic output-shard packing via a distributed global prefix sum.

Training-data pipelines end by writing the cleaned corpus into N output
shards of roughly equal BYTES (not rows) — downstream loaders stream
shards, so shard skew = loader skew.  Greedy sequential packing ("walk the
corpus in a fixed order, start a new shard every `target` bytes") is the
standard layout, but it needs a GLOBAL running sum, and the naive Spark
spelling — a window with no partitionBy — funnels the whole table through
ONE reducer (`WindowExec: No Partition Defined`), the exact anti-pattern
this library bans.

`global_running_sum` computes the same prefix sum with the classic
two-level plan a 1000-executor cluster needs:

1. range-shuffle on the order key (`repartitionByRange`) — ascending key
   ranges land in ascending partition ids, Spark's own global-sort layout —
   then a shuffle-free `sortWithinPartitions`: the ONLY full-data exchange
   in the plan;
2. per-partition totals — one tiny row per partition, map-side-combined —
   are prefix-summed on the driver (n_partitions rows, never data rows);
3. an Arrow-batched `mapInPandas` walks each sorted partition once,
   accumulating the local running sum across batches and adding the
   partition's offset: global = offset[pid] + local.  (A window
   `PARTITION BY spark_partition_id()` would compute the same thing but
   Catalyst can't see that the data is already clustered by physical
   partition, so it would pay a second full shuffle.)

The result is a pure function of (data, order key): independent of input
partitioning, cluster size, and range-boundary sampling, so an external
SQL engine replays it with a plain `SUM() OVER (ORDER BY key)` and the
DuckDB oracle value-checks every byte offset.

The packing rule: a row belongs to the shard its STARTING byte offset
falls in — `shard = (running - size) div target`.  Every shard except the
last then holds `target ± (max_row_size − 1)` bytes: bounded skew by
construction.

Row order inside the shuffle is pinned by `order_cols`, which must be a
total order (include a unique tiebreak column — the catalog query orders
by (md5(doc_id), doc_id)).  A hash order key both de-clusters the input
(any source/time locality is scattered uniformly over shards) and keeps
the layout stable under re-runs.

Reference analog: none — the reference is a single-process library; this
is part of the "what a 100 TB pipeline needs around the sketches" surface
(driver brief), same family as operators/sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PID = "__pack_pid"
_SIZE = "__pack_size"


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    out_col: str = "running_bytes",
    n_ranges: int | None = None,
) -> DataFrame:
    """Add `out_col` = inclusive prefix sum of `size_col` over the total
    order given by `order_cols` — without a global single-reducer window.

    `order_cols` must define a total order (unique tuples): ties would make
    the prefix sum depend on physical row placement.  NULL and negative
    sizes count as 0 (the row still occupies a position) — a negative size
    is meaningless for byte packing and would also make downstream offsets
    negative, where integer `div` truncation is no longer floor.
    """
    return global_running_sums(df, order_cols, [(size_col, out_col)], n_ranges)


def global_running_sums(
    df: DataFrame,
    order_cols: list[str],
    sums: list[tuple[str, str]],
    n_ranges: int | None = None,
) -> DataFrame:
    """Multi-column core of `global_running_sum`: inclusive prefix sums of
    several `(size_col, out_col)` pairs over one total order, sharing ONE
    range shuffle and ONE per-partition-totals job (callers needing two
    cumulative columns — the drift query's ECDF pair — would otherwise
    pay the shuffle, checkpoint, and offsets job once per column).  Same
    NULL/negative-clamp rule per column as the single-column wrapper; the
    clamp runs JVM-side, so the pandas cumsum only ever sees non-null
    int64 (no float64 round-trip above 2^53).
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    if not sums:
        raise ValueError("sums must name at least one (size_col, out_col)")
    spark = df.sparkSession
    if n_ranges is None:
        n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    size_names = [f"{_SIZE}_{j}" for j in range(len(sums))]

    # Materialize the range layout ONCE so the totals job and the cumsum
    # job see identical partition ids and row order (at cluster scale:
    # persist/checkpoint instead of localCheckpoint).
    ranged = df.repartitionByRange(
        n_ranges, *[F.col(c) for c in order_cols]
    ).sortWithinPartitions(*[F.col(c) for c in order_cols]).withColumn(
        _PID, F.spark_partition_id()
    )
    for sn, (size_col, _) in zip(size_names, sums):
        ranged = ranged.withColumn(
            sn,
            F.greatest(
                F.coalesce(F.col(size_col).cast("long"), F.lit(0)), F.lit(0)
            ),
        )
    ranged = ranged.localCheckpoint(eager=False)

    # Tiny: one partial-aggregated row per partition, prefix-summed
    # driver-side into exclusive offsets.
    totals = (
        ranged.groupBy(_PID)
        .agg(*[F.sum(sn).alias(sn) for sn in size_names])
        .orderBy(_PID)
        .collect()
    )
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(sums)
    for row in totals:
        offsets[row[_PID]] = list(acc)
        for j, sn in enumerate(size_names):
            acc[j] += row[sn]

    out_cols = [o for _, o in sums]
    out_schema = ranged.schema.fieldNames() + out_cols
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in ranged.schema
    ) + "".join(f", `{o}` bigint" for o in out_cols)

    def cumsum(batches):
        run = None  # partition offsets, loaded from the first batch's pid
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = list(offsets[int(pdf[_PID].iloc[0])])
            pdf = pdf.copy()
            for j, sn in enumerate(size_names):
                cs = pdf[sn].to_numpy().cumsum() + run[j]
                run[j] = int(cs[-1])
                pdf[out_cols[j]] = cs
            yield pdf[out_schema]

    return ranged.mapInPandas(cumsum, schema=schema).drop(_PID, *size_names)


def pack_shards(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    target_size: int,
    n_ranges: int | None = None,
) -> DataFrame:
    """Assign each row a `shard_id`: greedy sequential packing into shards
    of ~`target_size` bytes, walking rows in `order_cols` order.

    shard_id = floor(start_offset / target_size) where start_offset is the
    running sum BEFORE this row — integer arithmetic end to end, so the
    rule is exact at any corpus size and SQL-replayable.
    """
    if target_size <= 0:
        raise ValueError(f"target_size must be positive, got {target_size}")
    size = F.greatest(F.coalesce(F.col(size_col).cast("long"), F.lit(0)), F.lit(0))
    out = global_running_sum(df, order_cols, size_col, "running_bytes", n_ranges)
    start = F.col("running_bytes") - size
    # True integer division (Spark's `div` is long/long -> long, no double
    # round-trip), exact at ANY offset — a `/` quotient converts the
    # dividend to double and rounds once start exceeds 2^53 (~9 PB).
    # start >= 0 by construction (running_bytes sums coalesced >=0 sizes),
    # so div's truncation IS floor here.
    return (
        out.withColumn("__start", start)
        .withColumn("shard_id", F.expr(f"__start div {int(target_size)}"))
        .drop("__start")
    )


def shard_summary(packed: DataFrame, size_col: str) -> DataFrame:
    """Per-shard doc count + byte total (the balance report a writer logs)."""
    size = F.greatest(F.coalesce(F.col(size_col).cast("long"), F.lit(0)), F.lit(0))
    return packed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size).alias("shard_bytes"),
    )
