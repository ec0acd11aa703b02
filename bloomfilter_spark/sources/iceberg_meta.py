"""Pure-Python Apache Iceberg (format v1) table metadata layer.

The north rule reads "Iceberg tables of Common-Crawl-style web pages"
(BASELINE.json `north_star` / `input_hint`), but this container has no
``iceberg-spark-runtime`` jar and no network to fetch one — for four
rounds the snapshot-pinned build/resume contract could only execute
against a *string* pin.  This module closes that gap from first
principles: it writes and reads genuine Iceberg v1 table metadata —
``metadata/vN.metadata.json`` + ``version-hint.text`` (JSON), the
snapshot's manifest-list Avro file, and manifest Avro files with
spec-numbered field-ids — using the spec at
https://iceberg.apache.org/spec/ and the pure-Python Avro container
implementation in ``avro_format.py``.

What works without any jar:
- ``IcebergMetaTable.create`` / ``.append`` — commit parquet data files as
  append snapshots (sequential snapshot ids, deterministic timestamps,
  atomic metadata swap via tmp+rename and a version-hint update last);
- ``.data_files(snapshot_id)`` — resolve a snapshot to its parquet paths
  through manifest-list → manifests → non-deleted entries, exactly the
  planning walk a real engine does;
- ``read_iceberg_meta(spark, location, snapshot_id=...)`` — a
  snapshot-pinned Spark scan of the resolved files;
- incremental reads: ``data_files(b) - data_files(a)`` is the append diff.

On a real cluster with the runtime jar the same call sites use the
catalog path in ``tables.read_pages`` instead; the layout written here is
spec-shaped (v1, unpartitioned spec-id 0) so external engines with real
Iceberg support can read these tables.  The Avro bytes themselves are
verified in tests against Spark's bundled canonical Java Avro library
(non-circular), and the manifest schemas pin the spec's field-ids
(500-503 manifest-list, 100-105 data_file) so the files are recognizably
Iceberg, not a lookalike.

Limitations (documented, not hidden): v1 append/read only — no deletes,
no schema evolution, no partition transforms (single unpartitioned spec),
no column stats in manifests, single-writer commits (no optimistic retry
loop; the atomic rename gives last-writer-wins on one filesystem).
"""

from __future__ import annotations

import json
import os
import uuid
import zlib
from typing import Any

from bloomfilter_spark.sources import avro_format as avro

_EPOCH_MS = 1_600_000_000_000  # deterministic timestamps: base + seq

# --- Avro schemas for Iceberg v1 metadata files (spec field-ids) ----------

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "added_snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 503},
        {"name": "added_data_files_count", "type": ["null", "int"],
         "default": None, "field-id": 504},
        {"name": "existing_data_files_count", "type": ["null", "int"],
         "default": None, "field-id": 505},
        {"name": "deleted_data_files_count", "type": ["null", "int"],
         "default": None, "field-id": 506},
    ],
}

_DATA_FILE_SCHEMA = {
    "type": "record",
    "name": "r2",
    "fields": [
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition",
         "type": {"type": "record", "name": "r102", "fields": []},
         "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
        # required in v1, deprecated by the spec; constant is fine
        {"name": "block_size_in_bytes", "type": "long", "field-id": 105},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "data_file", "type": _DATA_FILE_SCHEMA, "field-id": 2},
    ],
}

_STATUS_EXISTING, _STATUS_ADDED, _STATUS_DELETED = 0, 1, 2

# --- Spark ↔ Iceberg schema mapping (primitives this library uses) --------

_SPARK_TO_ICEBERG = {
    "long": "long", "bigint": "long", "integer": "int", "int": "int",
    "string": "string", "double": "double", "float": "float",
    "boolean": "boolean", "binary": "binary", "date": "date",
    "timestamp": "timestamptz", "timestamp_ntz": "timestamp",
}


def _iceberg_schema_json(spark_schema) -> dict:
    """StructType → Iceberg schema JSON (flat primitive columns — the
    pages/documents shape; nested types are out of scope here)."""
    fields = []
    for i, f in enumerate(spark_schema.fields, start=1):
        t = f.dataType.typeName()
        if t == "decimal":
            ice: Any = f"decimal({f.dataType.precision}, {f.dataType.scale})"
        elif t in _SPARK_TO_ICEBERG:
            ice = _SPARK_TO_ICEBERG[t]
        else:
            raise ValueError(f"unsupported column type for Iceberg v1: {t}")
        fields.append({"id": i, "name": f.name,
                       "required": not f.nullable, "type": ice})
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _parquet_stats(path: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows, os.path.getsize(path)


class IcebergMetaTable:
    """Read/write handle on an Iceberg v1 table directory (no jar)."""

    def __init__(self, location: str):
        self.location = os.path.abspath(location)
        self.meta_dir = os.path.join(self.location, "metadata")
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if not os.path.exists(hint):
            raise FileNotFoundError(
                f"{location}: not an Iceberg table (no metadata/version-hint"
                ".text); create one with IcebergMetaTable.create()")
        with open(hint) as f:
            self.version = int(f.read().strip())
        with open(self._metadata_path(self.version)) as f:
            self.metadata = json.load(f)
        if self.metadata.get("format-version") != 1:
            raise ValueError("only Iceberg format-version 1 is supported")

    def _metadata_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.metadata.json")

    # -- creation / commits -------------------------------------------------

    @classmethod
    def create(cls, location: str, spark_schema) -> "IcebergMetaTable":
        location = os.path.abspath(location)
        meta_dir = os.path.join(location, "metadata")
        # refuse BEFORE touching the filesystem: a rejected create must not
        # leave empty data/metadata dirs behind on the target path
        if os.path.exists(os.path.join(meta_dir, "version-hint.text")):
            raise FileExistsError(f"{location}: table already exists")
        schema = _iceberg_schema_json(spark_schema)
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        os.makedirs(meta_dir, exist_ok=True)
        metadata = {
            "format-version": 1,
            # deterministic uuid: tables created at the same path are the
            # same table (keeps catalog-query value oracles stable)
            "table-uuid": str(uuid.UUID(int=zlib.crc32(location.encode()),
                                        version=4)),
            "location": location,
            "last-updated-ms": _EPOCH_MS,
            "last-column-id": len(schema["fields"]),
            "schema": schema,
            "schemas": [schema],
            "current-schema-id": 0,
            "partition-spec": [],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        cls._commit_metadata(meta_dir, 1, metadata)
        return cls(location)

    @staticmethod
    def _commit_metadata(meta_dir: str, version: int, metadata: dict) -> None:
        path = os.path.join(meta_dir, f"v{version}.metadata.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(metadata, f, indent=1)
        os.replace(tmp, path)
        hint_tmp = os.path.join(meta_dir, "version-hint.text.tmp")
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        # the hint swap IS the commit point: readers that raced the commit
        # see the previous complete version
        os.replace(hint_tmp, os.path.join(meta_dir, "version-hint.text"))

    def append(self, parquet_paths: list[str]) -> int:
        """Commit parquet files as a new append snapshot; returns its id."""
        if not parquet_paths:
            raise ValueError("append of zero data files")
        snapshots = self.metadata["snapshots"]
        sid = len(snapshots) + 1  # sequential, deterministic
        entries, added_rows = [], 0
        for p in parquet_paths:
            p = os.path.abspath(p)
            rows, size = _parquet_stats(p)
            added_rows += rows
            entries.append({
                "status": _STATUS_ADDED,
                "snapshot_id": sid,
                "data_file": {
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": rows,
                    "file_size_in_bytes": size,
                    "block_size_in_bytes": 64 * 1024 * 1024,
                },
            })
        manifest_path = os.path.join(
            self.meta_dir, f"{self.metadata['table-uuid']}-m{sid}.avro")
        avro.write_container(
            manifest_path, _MANIFEST_ENTRY_SCHEMA, entries,
            metadata={
                "schema": json.dumps(self.metadata["schema"]),
                "partition-spec": "[]",
                "partition-spec-id": "0",
                "format-version": "1",
                "content": "data",
            })
        # v1 manifest-list for the new snapshot = all prior manifests (their
        # adds become EXISTING data by virtue of older added_snapshot_id)
        # plus the new manifest
        prior = (self._manifest_list(snapshots[-1]) if snapshots else [])
        mlist = prior + [{
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "added_snapshot_id": sid,
            "added_data_files_count": len(entries),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
        }]
        mlist_path = os.path.join(self.meta_dir, f"snap-{sid}-1-list.avro")
        avro.write_container(
            mlist_path, _MANIFEST_LIST_SCHEMA, mlist,
            metadata={"format-version": "1"})
        snapshot = {
            "snapshot-id": sid,
            "timestamp-ms": _EPOCH_MS + sid,
            "summary": {"operation": "append",
                        "added-data-files": str(len(entries)),
                        "added-records": str(added_rows)},
            "manifest-list": mlist_path,
            "schema-id": 0,
        }
        if snapshots:
            snapshot["parent-snapshot-id"] = snapshots[-1]["snapshot-id"]
        md = dict(self.metadata)
        md["snapshots"] = snapshots + [snapshot]
        md["current-snapshot-id"] = sid
        md["last-updated-ms"] = snapshot["timestamp-ms"]
        md["snapshot-log"] = self.metadata["snapshot-log"] + [
            {"timestamp-ms": snapshot["timestamp-ms"], "snapshot-id": sid}]
        md["metadata-log"] = self.metadata["metadata-log"] + [
            {"timestamp-ms": self.metadata["last-updated-ms"],
             "metadata-file": self._metadata_path(self.version)}]
        self._commit_metadata(self.meta_dir, self.version + 1, md)
        self.version += 1
        self.metadata = md
        return sid

    # -- reads ---------------------------------------------------------------

    def current_snapshot_id(self) -> int | None:
        sid = self.metadata.get("current-snapshot-id", -1)
        return None if sid in (-1, None) else int(sid)

    def snapshot_ids(self) -> list[int]:
        return [int(s["snapshot-id"]) for s in self.metadata["snapshots"]]

    def _snapshot(self, snapshot_id: int | None) -> dict:
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
            if snapshot_id is None:
                raise ValueError(f"{self.location}: table has no snapshots")
        for s in self.metadata["snapshots"]:
            if int(s["snapshot-id"]) == int(snapshot_id):
                return s
        raise ValueError(
            f"{self.location}: no snapshot {snapshot_id} "
            f"(have {self.snapshot_ids()})")

    @staticmethod
    def _manifest_list(snapshot: dict) -> list[dict]:
        schema, _, records = avro.read_container(snapshot["manifest-list"])
        return records

    def data_files(self, snapshot_id: int | None = None) -> list[str]:
        """All live data-file paths at a snapshot (the planning walk:
        manifest-list → manifests → entries with status != DELETED)."""
        files: list[str] = []
        for mf in self._manifest_list(self._snapshot(snapshot_id)):
            _, meta, entries = avro.read_container(mf["manifest_path"])
            if meta.get("format-version", b"1") != b"1":
                raise ValueError("only v1 manifests supported")
            for e in entries:
                if e["status"] != _STATUS_DELETED:
                    files.append(e["data_file"]["file_path"])
        return sorted(files)

    def incremental_files(self, from_snapshot: int | None,
                          to_snapshot: int | None = None) -> list[str]:
        """Data files appended AFTER from_snapshot up to to_snapshot — the
        changelog read a resumed incremental build consumes."""
        new = set(self.data_files(to_snapshot))
        old = set(self.data_files(from_snapshot)) if from_snapshot else set()
        return sorted(new - old)


def is_iceberg_meta_table(path: str) -> bool:
    return os.path.exists(
        os.path.join(path, "metadata", "version-hint.text"))


def read_iceberg_meta(spark, location: str,
                      snapshot_id: int | None = None):
    """Snapshot-pinned Spark scan of an Iceberg v1 table directory.

    Resolves the snapshot's data files through the table's own metadata
    (no LIST of the data dir — orphan/uncommitted files are invisible,
    exactly as Iceberg semantics require) and scans them as parquet.
    Column pruning and predicate pushdown still apply per-file; what the
    jar would add on a real cluster is split planning from manifest stats
    and hidden-partition pruning."""
    tbl = IcebergMetaTable(location)
    files = tbl.data_files(snapshot_id)
    return spark.read.parquet(*files)


def snapshot_pin(location: str, snapshot_id: int) -> str:
    """Canonical input_pin string for checkpointed builds over a snapshot."""
    return f"iceberg:{os.path.abspath(location)}@{snapshot_id}"
