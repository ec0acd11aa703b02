"""Deterministic k-minimum-hash value sample — mergeable example values.

A profiler wants *example values* per column.  A random sample isn't
mergeable or reproducible; this sketch keeps the k values whose md5
content hashes are smallest — a KMV-style uniform sample that is a pure
function of the value SET, so it is bit-identical under any partitioning,
merge order, or engine, and exactly replayable in SQL:

    SELECT v FROM (SELECT DISTINCT col AS v FROM t)
    ORDER BY md5(v) LIMIT k

The md5 rule is the same content-hash determinism contract as
operators/sampling.py's threshold sampling (md5 of the value's utf8
bytes, compared as lowercase hex strings).

The fold consumes an Arrow STRUCT column <h: string, v: string> where
`h = md5(cast(v as binary))` is computed JVM-side in whole-stage codegen
(hashing multi-hundred-byte strings in the Python fold is the measured
bottleneck of wide scans — see sketches/freqitems.py's fold note).  All
per-batch work stays in Arrow C++: hash value_counts → first-occurrence
take → top-k by hash; at most k pairs per batch materialize in Python.
"""

from __future__ import annotations

import struct

from bloomfilter_spark.sketches import serde


@serde.register(serde.KIND_SAMPLE)
class SampleSketch:
    """k smallest (md5-hash, value) pairs over distinct values."""

    __slots__ = ("k", "n_added", "_pairs")

    _PARAMS = struct.Struct("<II")  # k u32, n_pairs u32

    def __init__(self, k: int = 16) -> None:
        if not isinstance(k, int) or k < 1 or k > 1 << 20:
            raise ValueError(f"sample: k must be an integer in [1, 2^20], got {k}")
        self.k = k
        self.n_added = 0
        self._pairs: dict[str, str] = {}  # hash hex -> value (≤ k entries)

    def empty_like(self) -> "SampleSketch":
        return SampleSketch(self.k)

    # -- update ---------------------------------------------------------------

    def _absorb(self, pairs) -> None:
        self._pairs.update(pairs)
        if len(self._pairs) > self.k:
            keep = sorted(self._pairs)[: self.k]
            self._pairs = {h: self._pairs[h] for h in keep}

    def update_arrow(self, arr) -> None:
        """Fold an Arrow struct<h: string, v: string> array (nulls already
        dropped upstream)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if len(arr) == 0:
            return
        if not pa.types.is_struct(arr.type):
            raise ValueError(
                f"sample: expected struct<h,v> column, got {arr.type}"
            )
        h = arr.field("h")
        # distinct hashes (hash equality ⇔ value equality under md5), then
        # the first occurrence's value for each — all arrow-side
        uniq = pc.value_counts(h).field("values")
        if len(uniq) > self.k:
            # top-k smallest hashes among this batch's distinct values
            idx = pc.select_k_unstable(
                pa.table({"h": uniq}), self.k, sort_keys=[("h", "ascending")]
            )
            uniq = pc.take(uniq, idx)
        first = pc.index_in(uniq, value_set=h)
        vals = pc.take(arr.field("v"), first)
        self.n_added += len(arr)
        self._absorb(zip(uniq.to_pylist(), vals.to_pylist()))

    def update_pairs(self, pairs) -> None:
        """Python-side fold of (hash_hex, value) pairs — the small-data /
        test path; same state rule as the arrow fold."""
        pairs = list(pairs)
        self.n_added += len(pairs)
        self._absorb(pairs)

    # -- query ----------------------------------------------------------------

    def values(self) -> list[str]:
        """Sampled values, ordered by content hash (the canonical,
        engine-replayable order)."""
        return [self._pairs[h] for h in sorted(self._pairs)]

    def stats(self) -> dict:
        return {"k": self.k, "n_sampled": len(self._pairs), "n_added": self.n_added}

    # -- merge ----------------------------------------------------------------

    def _check_geometry(self, other: "SampleSketch") -> None:
        if not isinstance(other, SampleSketch) or self.k != other.k:
            raise ValueError("sample sketches must have the same k for merge")

    def merge(self, other: "SampleSketch") -> "SampleSketch":
        self._check_geometry(other)
        self._absorb(other._pairs.items())
        self.n_added += other.n_added
        return self

    def clear(self) -> None:
        self._pairs = {}
        self.n_added = 0

    # -- serde ----------------------------------------------------------------

    def to_bytes(self) -> bytes:
        params = self._PARAMS.pack(self.k, len(self._pairs))
        chunks = []
        for h in sorted(self._pairs):
            hv = h.encode("utf-8")
            vv = self._pairs[h].encode("utf-8")
            chunks.append(struct.pack("<II", len(hv), len(vv)) + hv + vv)
        return serde.pack(serde.KIND_SAMPLE, 0, self.n_added, params, b"".join(chunks))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SampleSketch":
        kind, _seed, n_added, params, payload = serde.unpack(blob)
        if kind != serde.KIND_SAMPLE:
            raise ValueError(f"not a sample blob (kind={kind})")
        k, n = cls._PARAMS.unpack(params)
        sk = cls(k)
        payload = bytes(payload)
        off = 0
        for _ in range(n):
            lh, lv = struct.unpack_from("<II", payload, off)
            off += 8
            h = payload[off : off + lh].decode("utf-8")
            off += lh
            v = payload[off : off + lv].decode("utf-8")
            off += lv
            sk._pairs[h] = v
        sk.n_added = n_added
        return sk

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, SampleSketch) and self.to_bytes() == other.to_bytes()
        )
