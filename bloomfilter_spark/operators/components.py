"""Connected components over duplicate-pair edges → dedup clusters.

The dedup operators (ngram_jaccard_pairs, minhash LSH, simhash, embedding
near-dup) emit *pairs*; an actual training-data dedup pass needs clusters
and one kept representative per cluster (the step the reference leaves to
its callers — its filters answer "probably seen?", shaia/BloomFilter
README.md:1-40, but never group).  This closes the pipeline:

  pairs -> connected_components -> (id, component) -> keep component min.

Algorithm: iterative min-label propagation with pointer jumping.  Each
round every node takes the min label over {itself} ∪ neighbors, then
shortcuts through its own label's label (L(v) <- L(L(v))).  Plain
propagation needs O(diameter) rounds; the pointer-jump join makes chains
collapse in O(log diameter) — the same shortcutting idea as the
large-star/small-star MapReduce formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14).  Near-dup graphs have tiny
components, so 3-5 rounds is typical; max_iter is a safety rail.

Scale notes: each round is two shuffles (join edges⋈labels on src, then
groupBy id) plus one broadcast-eligible self-join for the jump — all on
8-byte keys, no driver-side state.  Lineage is truncated per round with
localCheckpoint so the plan doesn't grow with iterations; convergence is
detected with a single count() action on changed labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (id, component) where component = the minimum node id reachable
    from `id`.  `nodes` (optional, one column `id_col`) adds isolated nodes
    that appear in no edge — each is its own component.  Deterministic:
    the fixpoint is a pure function of the edge set.
    """
    # materialize the caller's edge plan ONCE before symmetrizing — both
    # unionAll branches below read it, and an expensive upstream (e.g. the
    # full n-gram-Jaccard pair job in dedup_clusters) must not run twice
    edges = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint()
    sym = (
        edges.unionAll(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = sym.select(F.col("s").alias("id")).distinct()
    if nodes is not None:
        labels = labels.unionAll(
            nodes.select(F.col(id_col).alias("id")).filter(
                F.col("id").isNotNull()
            )
        ).distinct()
    labels = labels.select("id", F.col("id").alias("comp")).localCheckpoint()

    for _ in range(max_iter):
        # min over {self} ∪ neighbor labels
        msgs = sym.join(labels, sym["s"] == labels["id"]).select(
            F.col("d").alias("id"), F.col("comp")
        )
        new = (
            labels.unionAll(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: follow my label to ITS label (collapses chains
        # logarithmically; a label is always a node id, so the join hits)
        parent = new.select(
            F.col("id").alias("p_id"), F.col("comp").alias("p_comp")
        )
        jumped = (
            new.join(parent, new["comp"] == parent["p_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("p_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            jumped.join(labels.withColumnRenamed("comp", "old"), "id")
            .filter(F.col("comp") != F.col("old"))
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels.select("id", F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_keep(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Cluster membership + keep decision for every row of `df`.

    Returns (id_col, component, is_kept): component = min doc id in the
    row's duplicate cluster (its own id when it has no duplicates);
    is_kept = this row IS that minimum — exactly one kept row per cluster.
    """
    labeled = _component_labels(df, id_col, pairs, [], src, dst)
    return labeled.withColumn(
        "is_kept",
        F.coalesce(F.col(id_col) == F.col("component"), F.lit(True)),
    )


def _component_labels(df, id_col, pairs, extra_cols, src, dst):
    """(id, *extra_cols, component) for every row — the shared labeling of
    both keep rules.  NULL-id rows get a NULL component and (because the
    keep rules coalesce NULL decisions to kept) act as singletons: a NULL
    id must never cross-link two unrelated rows."""
    comp = connected_components(
        pairs, src=src, dst=dst,
        nodes=df.filter(F.col(id_col).isNotNull()).select(id_col),
        id_col=id_col,
    )
    # reserved aliases: comp's columns are literally (id, component), so
    # id_col == "id" (the library's own default node name) or a caller
    # "component" column would otherwise be AMBIGUOUS_REFERENCE
    comp = comp.select(
        F.col("id").alias("__cc_id"), F.col("component").alias("__cc_comp")
    )
    return (
        df.select(F.col(id_col), *[F.col(c) for c in extra_cols])
        .join(comp, df[id_col] == F.col("__cc_id"), "left")
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.when(
                F.col(id_col).isNotNull(),
                F.coalesce(F.col("__cc_comp"), F.col(id_col)),
            ).alias("component"),
        )
    )


def dedup_keep_best(
    df: DataFrame,
    id_col: str,
    priority_col: str,
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """`dedup_keep` with a QUALITY rule: keep the cluster member with the
    highest `priority_col` (longest text, best classifier logit, …),
    falling back to the smallest id on ties — the RefinedWeb-style
    "keep the best representative, not the first-seen one".

    One extra group-partitioned window over (component) beyond
    `dedup_keep`; NULL priorities rank below every non-null value
    (nulls_last) so a scored-vs-unscored tie never drops the scored row.
    NULL-id rows are singletons (component NULL, always kept) — they are
    excluded from the window so they can never shadow a real cluster.
    Returns (id_col, priority_col, component, is_kept).
    """
    from pyspark.sql import Window

    labeled = _component_labels(df, id_col, pairs, [priority_col], src, dst)
    nulls = labeled.filter(F.col(id_col).isNull()).withColumn(
        "is_kept", F.lit(True)
    )
    w = Window.partitionBy("component").orderBy(
        F.col(priority_col).desc_nulls_last(), F.col(id_col)
    )
    ranked = (
        labeled.filter(F.col(id_col).isNotNull())
        .withColumn("is_kept", F.row_number().over(w) == 1)
    )
    return ranked.unionByName(nulls)
