"""Table source abstraction: Iceberg when available, parquet otherwise.

The north rule targets "Iceberg tables of Common-Crawl-style web pages"
(BASELINE.json:14).  This sandbox has no Iceberg runtime jar, so the
fixtures are plain parquet (TESTDATA.md); every operator in this library
takes a DataFrame, so the only Iceberg-specific surface is the reader
below.  On a real cluster:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.catalog.cc=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.cc.type=hive ...

and `read_pages(spark, "cc.web.pages")` resolves through the catalog —
gaining hidden-partition pruning on warc_ts (days/hours transform) and
split planning from Iceberg manifests; everything downstream (sketch
builds, checkpoint lineage keyed on partition ids, merge trees) is
unchanged.  Checkpoint/resume notes in operators/checkpoint.py assume
immutable inputs — pin an Iceberg `snapshot-id` for resumable builds:

    read_pages(spark, "cc.web.pages", snapshot_id=123456789)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_pages(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a pages table from an Iceberg catalog table name, an Iceberg
    table directory (resolved through the pure-Python metadata layer in
    iceberg_meta.py — no jar needed), or a parquet path.  Catalog names
    (no '/') require the Iceberg runtime."""
    if "/" in source or source.endswith(".parquet"):
        from bloomfilter_spark.sources.iceberg_meta import (
            is_iceberg_meta_table,
            read_iceberg_meta,
        )

        if is_iceberg_meta_table(source):
            return read_iceberg_meta(spark, source, snapshot_id=snapshot_id)
        if snapshot_id is not None:
            raise ValueError(
                "snapshot_id was passed but the path is plain parquet, not "
                "an Iceberg table — the pin would be silently ignored"
            )
        return spark.read.parquet(source)
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; pass a parquet path or "
            "add the iceberg-spark-runtime package (see module docstring)"
        )
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.load(source)


def current_snapshot_id(spark: SparkSession, table: str) -> int | None:
    """Current snapshot id of an Iceberg catalog table (None for an empty
    table).  Pass the result as read_pages(snapshot_id=...) AND as
    build_multi_checkpointed(input_pin=f"iceberg:{table}@{sid}") so a
    killed build resumes against the EXACT table version it started from —
    an append between kill and resume changes the pin and the resume is
    rejected instead of silently mixing snapshots.  Iceberg table
    DIRECTORIES resolve through the pure-Python metadata layer (no jar)."""
    if "/" in table:
        from bloomfilter_spark.sources.iceberg_meta import IcebergMetaTable

        return IcebergMetaTable(table).current_snapshot_id()
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath (see module docstring)"
        )
    # .history, not .snapshots: the newest row by committed_at is the most
    # recently CREATED snapshot, which after a rollback (or with staged
    # WAP snapshots) is not the table's CURRENT one — the pin would then
    # reference non-current data.  history's is_current_ancestor rows
    # ordered by made_current_at give the snapshot the table actually
    # serves.
    row = (
        spark.sql(
            f"SELECT snapshot_id FROM {table}.history "
            "WHERE is_current_ancestor ORDER BY made_current_at DESC LIMIT 1"
        )
        .first()
    )
    return int(row["snapshot_id"]) if row is not None else None
