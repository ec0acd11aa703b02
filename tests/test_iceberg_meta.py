"""Pure-Python Iceberg v1 metadata layer — the north rule's Iceberg line
item executed LIVE without the runtime jar.

Validation is deliberately non-circular where the format matters:
- zigzag/varint byte pins come from the Avro spec's own example table;
- every container file written here is re-read by the CANONICAL Java Avro
  implementation bundled with Spark (avro-1.12.1.jar, via py4j), and a
  file written by the Java library is read back by our decoder;
- the Iceberg walk (version-hint → metadata.json → manifest-list →
  manifests → data files) follows https://iceberg.apache.org/spec/ with
  the spec's field-ids pinned in the schemas.
"""

from __future__ import annotations

import glob
import io
import json
import os

import pytest

from bloomfilter_spark.sources import avro_format as avro
from bloomfilter_spark.sources.iceberg_meta import (
    IcebergMetaTable,
    is_iceberg_meta_table,
    read_iceberg_meta,
    snapshot_pin,
)

# ---------------------------------------------------------------------------
# Avro binary encoding
# ---------------------------------------------------------------------------


def test_zigzag_spec_pins():
    # the exact example table from the Avro specification §binary encoding
    for n, u in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4),
                 (-64, 127), (64, 128)]:
        assert avro.zigzag_encode(n) == u
        assert avro.zigzag_decode(u) == n


def test_varint_bytes_pin():
    buf = io.BytesIO()
    avro.write_long(buf, 64)  # zigzag 128 -> 0x80 0x01
    assert buf.getvalue() == b"\x80\x01"
    buf = io.BytesIO()
    avro.write_long(buf, -64)  # zigzag 127 -> 0x7f
    assert buf.getvalue() == b"\x7f"


def test_record_encoding_pin():
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    buf = io.BytesIO()
    avro.encode(buf, schema, {"a": 1, "b": "hi"})
    # long 1 -> \x02; string "hi" -> len \x04 + bytes  (worked example in
    # the spec's "Binary encoding" section uses this exact record)
    assert buf.getvalue() == b"\x02\x04hi"


_FULL_SCHEMA = {"type": "record", "name": "t", "fields": [
    {"name": "a", "type": "long"},
    {"name": "b", "type": "string"},
    {"name": "c", "type": ["null", "long"]},
    {"name": "d", "type": {"type": "array", "items": "int"}},
    {"name": "e", "type": {"type": "map", "values": "bytes"}},
    {"name": "f", "type": "double"},
    {"name": "g", "type": "boolean"},
    {"name": "h", "type": {"type": "record", "name": "empty", "fields": []}},
]}
_FULL_RECORDS = [
    {"a": 1, "b": "héllo", "c": None, "d": [1, -2, 3],
     "e": {"k": b"\x00\x01"}, "f": 3.5, "g": True, "h": {}},
    {"a": -(2 ** 62), "b": "", "c": 7, "d": [], "e": {}, "f": -0.0,
     "g": False, "h": {}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    avro.write_container(p, _FULL_SCHEMA, _FULL_RECORDS, codec=codec)
    schema, meta, records = avro.read_container(p)
    assert schema == _FULL_SCHEMA
    assert records == _FULL_RECORDS
    assert meta["avro.codec"] == codec.encode()
    with open(p, "rb") as f:
        assert f.read(4) == b"Obj\x01"  # container magic, spec-pinned


def test_container_corruption_rejected(tmp_path):
    p = str(tmp_path / "t.avro")
    avro.write_container(p, _FULL_SCHEMA, _FULL_RECORDS)
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # flip a sync-marker byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        avro.read_container(p)


def test_multi_block_container(tmp_path):
    schema = {"type": "record", "name": "n",
              "fields": [{"name": "i", "type": "long"}]}
    recs = [{"i": i} for i in range(5000)]
    p = str(tmp_path / "blocks.avro")
    avro.write_container(p, schema, recs, records_per_block=512)
    _, _, out = avro.read_container(p)
    assert out == recs


# ---------------------------------------------------------------------------
# non-circular: cross-validate against the canonical Java Avro library
# ---------------------------------------------------------------------------


def test_java_avro_reads_our_files(spark, tmp_path):
    """Spark's bundled org.apache.avro (the reference implementation) must
    parse our container byte-for-byte — schema, values, nulls, codec."""
    p = str(tmp_path / "ours.avro")
    avro.write_container(p, _FULL_SCHEMA, _FULL_RECORDS, codec="deflate")
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    out = []
    while reader.hasNext():
        out.append(reader.next())
    assert len(out) == len(_FULL_RECORDS)
    assert json.loads(reader.getSchema().toString()) == _FULL_SCHEMA
    r0, r1 = out
    assert r0.get("a") == 1 and r0.get("b").toString() == "héllo"
    assert r0.get("c") is None and r1.get("c") == 7
    assert [v for v in r0.get("d")] == [1, -2, 3]
    assert r1.get("a") == -(2 ** 62)
    assert bool(r0.get("g")) is True and bool(r1.get("g")) is False


def test_we_read_java_avro_files(spark, tmp_path):
    """And the reverse: a file written by the Java library (its own block
    framing, its random sync marker, deflate codec) reads back exactly."""
    p = str(tmp_path / "theirs.avro")
    jvm = spark._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps({
        "type": "record", "name": "jrec", "fields": [
            {"name": "path", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "opt", "type": ["null", "string"], "default": None},
        ]}))
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(jschema))
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(jschema, jvm.java.io.File(p))
    for i in range(100):
        rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
        rec.put("path", f"/data/file-{i}.parquet")
        rec.put("n", i * 1000)
        rec.put("opt", None if i % 3 else f"s{i}")
        writer.append(rec)
    writer.close()
    schema, _, records = avro.read_container(p)
    assert len(records) == 100
    assert records[0] == {"path": "/data/file-0.parquet", "n": 0, "opt": "s0"}
    assert records[1]["opt"] is None
    assert records[99]["n"] == 99000


# ---------------------------------------------------------------------------
# Iceberg v1 table lifecycle
# ---------------------------------------------------------------------------


@pytest.fixture()
def ice(spark, documents, tmp_path):
    loc = str(tmp_path / "tbl")
    tbl = IcebergMetaTable.create(loc, documents.schema)
    d1, d2 = f"{loc}/data/b1", f"{loc}/data/b2"
    documents.filter("doc_id % 3 = 0").repartition(2).write.parquet(d1)
    s1 = tbl.append(sorted(glob.glob(d1 + "/*.parquet")))
    documents.filter("doc_id % 3 != 0 OR doc_id IS NULL").repartition(
        3).write.parquet(d2)
    s2 = tbl.append(sorted(glob.glob(d2 + "/*.parquet")))
    return loc, tbl, s1, s2


def test_snapshot_isolation_and_time_travel(spark, documents, ice):
    loc, tbl, s1, s2 = ice
    assert tbl.snapshot_ids() == [s1, s2]
    assert tbl.current_snapshot_id() == s2
    total = documents.count()
    part = documents.filter("doc_id % 3 = 0").count()
    # pinned read sees the table AS OF that snapshot
    assert read_iceberg_meta(spark, loc, snapshot_id=s1).count() == part
    assert read_iceberg_meta(spark, loc).count() == total
    # the append diff is exactly the incremental file set
    assert set(tbl.incremental_files(s1, s2)) == (
        set(tbl.data_files(s2)) - set(tbl.data_files(s1)))
    # values, not just counts: pinned scan == direct filter
    got = sorted(r.doc_id for r in
                 read_iceberg_meta(spark, loc, s1).select("doc_id").collect()
                 if r.doc_id is not None)
    want = sorted(r.doc_id for r in documents.filter(
        "doc_id % 3 = 0").select("doc_id").collect() if r.doc_id is not None)
    assert got == want


def test_orphan_files_invisible(spark, documents, ice):
    """Planning goes through manifests, never a directory LIST — a stray
    uncommitted parquet in data/ must not appear in any scan."""
    loc, tbl, s1, s2 = ice
    orphan = f"{loc}/data/stray_uncommitted"
    documents.limit(5).coalesce(1).write.parquet(orphan)
    assert read_iceberg_meta(spark, loc).count() == documents.count()
    assert not any("stray_uncommitted" in f for f in tbl.data_files())


def test_reader_reopens_committed_state(ice):
    loc, tbl, s1, s2 = ice
    t2 = IcebergMetaTable(loc)
    assert t2.snapshot_ids() == tbl.snapshot_ids()
    assert t2.data_files(s1) == tbl.data_files(s1)
    with pytest.raises(ValueError, match="no snapshot 99"):
        t2.data_files(99)


def test_read_pages_resolves_iceberg_dirs(spark, documents, ice):
    from bloomfilter_spark.sources.tables import (
        current_snapshot_id,
        read_pages,
    )

    loc, tbl, s1, s2 = ice
    assert is_iceberg_meta_table(loc)
    assert current_snapshot_id(spark, loc) == s2
    assert read_pages(spark, loc, snapshot_id=s1).count() == (
        documents.filter("doc_id % 3 = 0").count())
    # a snapshot pin on a PLAIN parquet path must fail loudly, not no-op
    with pytest.raises(ValueError, match="plain parquet"):
        read_pages(spark, f"{loc}/data/b1", snapshot_id=s1)


def test_checkpointed_build_resumes_against_snapshot_pin(spark, documents,
                                                         ice):
    """The north-rule resume contract, executed LIVE against real Iceberg
    metadata: build pinned at snapshot 1, resume with the same pin (all
    partials reused, bit-identical result), then an append moves the table
    to snapshot 2 and a resume against the NEW pin is rejected."""
    from bloomfilter_spark.operators.build import bloom_factory
    from bloomfilter_spark.operators.pipeline import build_multi_checkpointed

    loc, tbl, s1, s2 = ice
    df1 = read_iceberg_meta(spark, loc, snapshot_id=s1).filter(
        "doc_id IS NOT NULL").withColumn("url", F_concat_docid())
    specs = {"bloom_url": ("url", bloom_factory(2000, 0.01))}
    ckpt = f"{loc}/ckpt"
    pin1 = snapshot_pin(loc, s1)
    a, _ = build_multi_checkpointed(df1, specs, ckpt, input_pin=pin1)
    b, lineage = build_multi_checkpointed(df1, specs, ckpt, input_pin=pin1)
    assert a["bloom_url"].to_bytes() == b["bloom_url"].to_bytes()
    assert lineage.toPandas()["resumed"].all()
    with pytest.raises(ValueError, match="different suite build"):
        build_multi_checkpointed(df1, specs, ckpt,
                                 input_pin=snapshot_pin(loc, s2))


def test_incremental_build_bit_identical_to_full(spark, ice):
    """Incremental maintenance contract (catalog `iceberg_incremental_build`
    at fixture scale): a sketch built at snapshot 1 and EXTENDED with only
    the `incremental_files(s1, s2)` changelog is byte-identical to a
    from-scratch build at snapshot 2 — snapshot-1 bytes are never re-read."""
    from bloomfilter_spark.operators.build import (
        bloom_factory,
        build_sketch,
        hll_factory,
    )

    loc, tbl, s1, s2 = ice
    key = "doc_id IS NOT NULL"
    snap1 = read_iceberg_meta(spark, loc, s1).filter(key)
    incr = spark.read.parquet(*tbl.incremental_files(s1, s2)).filter(key)
    full = read_iceberg_meta(spark, loc, s2).filter(key)
    for fac in (hll_factory(precision=12), bloom_factory(4000, 0.01)):
        merged = build_sketch(snap1, "doc_id", fac).merge(
            build_sketch(incr, "doc_id", fac))
        assert merged.to_bytes() == build_sketch(full, "doc_id", fac).to_bytes()


def F_concat_docid():
    from pyspark.sql import functions as F

    return F.concat(F.lit("https://example.com/doc/"),
                    F.col("doc_id").cast("string"))


def test_metadata_files_are_spec_shaped(ice):
    """The on-disk layout is recognizably Iceberg: version-hint, vN
    metadata JSON with required v1 keys, snap-*-list Avro manifest list
    with field-ids 500+, manifest entries with data_file field-ids 100+."""
    loc, tbl, s1, s2 = ice
    meta_dir = os.path.join(loc, "metadata")
    assert open(os.path.join(meta_dir, "version-hint.text")).read() == "3"
    md = json.load(open(os.path.join(meta_dir, "v3.metadata.json")))
    for key in ("format-version", "table-uuid", "schema", "partition-specs",
                "current-snapshot-id", "snapshots", "snapshot-log"):
        assert key in md
    assert md["format-version"] == 1
    snap = md["snapshots"][-1]
    assert snap["summary"]["operation"] == "append"
    mlist_schema, _, mlist = avro.read_container(snap["manifest-list"])
    ids = {f["name"]: f.get("field-id") for f in mlist_schema["fields"]}
    assert ids["manifest_path"] == 500 and ids["manifest_length"] == 501
    man_schema, man_meta, entries = avro.read_container(
        mlist[-1]["manifest_path"])
    assert man_meta["format-version"] == b"1"
    df_fields = {f["name"]: f.get("field-id")
                 for f in man_schema["fields"][2]["type"]["fields"]}
    assert df_fields["file_path"] == 100
    assert df_fields["record_count"] == 103
    assert all(e["status"] == 1 for e in entries)  # ADDED
    assert all(e["data_file"]["file_format"] == "PARQUET" for e in entries)


def test_enum_and_float_decode_reject_corruption(tmp_path):
    """Corrupt containers must fail loudly: a negative enum index raises
    (never silently selects from the end via Python indexing) and a
    truncated float/double raises the module's EOFError convention."""
    import io

    import pytest

    from bloomfilter_spark.sources.avro_format import decode, write_long

    buf = io.BytesIO()
    write_long(buf, -1)
    buf.seek(0)
    with pytest.raises(ValueError, match="enum index"):
        decode(buf, {"type": "enum", "name": "e", "symbols": ["a", "b"]})

    with pytest.raises(EOFError, match="truncated float"):
        decode(io.BytesIO(b"\x01\x02"), "float")
    with pytest.raises(EOFError, match="truncated double"):
        decode(io.BytesIO(b"\x01\x02\x03"), "double")


def test_refused_create_leaves_no_dirs(tmp_path):
    """create() on a path with an unsupported column type must refuse
    BEFORE touching the filesystem — no stray data/metadata dirs that a
    later reader could misread as a partially-initialized table."""
    import pytest

    from pyspark.sql.types import MapType, StringType, StructField, StructType

    from bloomfilter_spark.sources.iceberg_meta import IcebergMetaTable

    target = str(tmp_path / "not_a_table")
    bad = StructType([StructField("m", MapType(StringType(), StringType()))])
    with pytest.raises(Exception):
        IcebergMetaTable.create(target, bad)
    assert not os.path.exists(target)
