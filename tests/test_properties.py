"""Property-based (hypothesis) and hostile-input tests.

The reference pins correctness with exhaustive boundary enumeration
(SURVEY.md §5); hypothesis generalizes that — arbitrary byte strings,
unicode, huge values, adversarial blobs — against the invariants that can
NEVER break: vectorized ≡ scalar hashing, zero false negatives, serde
round-trip identity, monotone quantile ranks, merge ≡ concat builds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from bloomfilter_spark.functions.hashing import (
    bytes_view_of_binary,
    bytes_view_of_strings,
    murmur3_x64_128,
)
from bloomfilter_spark.sketches import serde
from bloomfilter_spark.sketches.bloom import BloomFilter
from bloomfilter_spark.sketches.hll import HyperLogLog
from bloomfilter_spark.sketches.kll import KLLSketch
from tests.scalar_oracle import murmur3_x64_128_scalar

_SET = settings(max_examples=60, deadline=None)


@_SET
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=40),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_vectorized_matches_scalar_murmur(blobs, seed):
    flat, off = bytes_view_of_binary(pd.Series(blobs, dtype=object))
    h1, h2 = murmur3_x64_128(flat, off, seed=seed)
    for i, b in enumerate(blobs):
        e1, e2 = murmur3_x64_128_scalar(b, seed)
        assert (int(h1[i]), int(h2[i])) == (e1, e2)


@_SET
@given(st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=40))
def test_unicode_strings_hash_as_utf8(texts):
    from bloomfilter_spark.functions.hashing import DEFAULT_SEED

    flat, off = bytes_view_of_strings(pd.Series(texts, dtype=object))
    h1, _ = murmur3_x64_128(flat, off)
    for i, t in enumerate(texts):
        e1, _ = murmur3_x64_128_scalar(t.encode("utf-8"), DEFAULT_SEED)
        assert int(h1[i]) == e1


@_SET
@given(st.lists(st.text(min_size=1, max_size=60), min_size=1, max_size=200,
                unique=True))
def test_bloom_never_false_negative(keys):
    bf = BloomFilter.create(max(len(keys), 16), 0.01)
    bf.update(pd.Series(keys))
    assert bf.contains(pd.Series(keys)).all()


@_SET
@given(
    st.integers(min_value=1, max_value=9),                 # k
    st.integers(min_value=1, max_value=40),                # blocks of 512 bits
    st.lists(st.integers(min_value=0, max_value=2**64 - 1),
             min_size=1, max_size=120),                    # h1 stream
    st.integers(min_value=0, max_value=2**64 - 1),         # h2 base
)
def test_lane_probe_equals_full_matrix(k, blocks, h1s, h2base):
    """The lane-at-a-time early-out probe must be bit-equivalent to
    evaluating the full (n, k) position matrix — including uint64
    wraparound in h1 + i*h2 — for arbitrary geometry and hash values."""
    from bloomfilter_spark.sketches.bloom import U64, lane_probe

    m = blocks * 512
    bf = BloomFilter(m=m, k=k)
    # populate ~half the filter deterministically from the inputs
    rng = np.random.RandomState(blocks * 31 + k)
    fill = rng.randint(0, 2**63, size=max(1, m // 128), dtype=np.int64)
    bf.add_hashes(fill.astype(np.uint64), (fill * 31 + 7).astype(np.uint64))

    h1 = np.array(h1s, dtype=np.uint64)
    h2 = (h1 * U64(2654435761) + U64(h2base)) # arbitrary paired stream
    got = bf.contains_hashes(h1, h2)

    pos = bf._positions(h1, h2)
    want = ((bf.words[(pos >> U64(6)).view(np.int64)]
             >> (pos & U64(63))) & U64(1)).astype(bool).all(axis=1)
    assert (got == want).all()
    # and the shared helper agrees when driven directly
    words = bf.words
    direct = lane_probe(
        h1, h2, k, m,
        lambda p: (words[(p >> U64(6)).view(np.int64)] >> (p & U64(63))) & U64(1),
    )
    assert (direct == want).all()


@_SET
@given(st.lists(st.text(min_size=1, max_size=40), min_size=2, max_size=100,
                unique=True))
def test_bloom_split_merge_equals_single_build(keys):
    half = len(keys) // 2
    single = BloomFilter.create(256, 0.01)
    single.update(pd.Series(keys))
    a = BloomFilter.create(256, 0.01)
    b = BloomFilter.create(256, 0.01)
    a.update(pd.Series(keys[:half]))
    b.update(pd.Series(keys[half:]))
    a.merge(b)
    assert a.words.tobytes() == single.words.tobytes()


@_SET
@given(st.integers(min_value=1, max_value=10**7),
       st.floats(min_value=1e-6, max_value=0.5))
def test_sizing_invariants(n, p):
    bf = BloomFilter.create(n, p)
    assert bf.m % 512 == 0 and bf.m > 0 and bf.k >= 1
    # k never exceeds the theoretical optimum by more than rounding
    import math
    assert bf.k <= max(1, int(-math.log(p) / math.log(2)) + 1)


@_SET
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          width=32), min_size=1, max_size=500))
def test_kll_rank_monotone_and_bounded(values):
    sk = KLLSketch(k=100)
    sk.update(np.array(values, dtype=np.float64))
    qs = [sk.quantile(q) for q in (0.1, 0.5, 0.9)]
    assert qs == sorted(qs)
    assert min(values) <= qs[0] and qs[-1] <= max(values)


@_SET
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
                max_size=300))
def test_hll_serde_roundtrip_preserves_estimate(ids):
    h = HyperLogLog(p=12)
    h.update(pd.Series(ids))
    h2 = serde.deserialize(h.to_bytes())
    assert h2.estimate() == h.estimate()
    assert h2.to_bytes() == h.to_bytes()


@_SET
@given(st.binary(min_size=0, max_size=200))
def test_garbage_blobs_rejected(blob):
    with pytest.raises((ValueError, Exception)):
        serde.deserialize(blob)


def test_truncated_real_blob_rejected():
    bf = BloomFilter.create(1000, 0.01)
    good = bf.to_bytes()
    for cut in (1, 8, len(good) // 2, len(good) - 1):
        with pytest.raises(Exception):
            serde.deserialize(good[:cut])


# ---------------------------------------------------------------------------
# hostile inputs through the distributed path
# ---------------------------------------------------------------------------


def test_huge_and_unicode_strings_distributed(spark):
    from bloomfilter_spark.operators.build import bloom_factory, build_sketch
    from bloomfilter_spark.operators.membership import might_contain_udf

    rows = [
        (1, "x" * 300_000),                       # multi-hundred-KB value
        (2, "naïve café züriøéñ 中文 🚀" * 100),   # unicode, multi-byte
        (3, ""),                                  # empty string
        (4, "plain"),
    ]
    df = spark.createDataFrame(rows, "id long, v string")
    sk = build_sketch(df, "v", bloom_factory(1024, 0.01))
    hit = might_contain_udf(spark, sk)
    got = df.withColumn("h", hit("v")).toPandas()
    assert got.h.all()  # zero false negatives incl. hostile values


def test_empty_input_distributed(spark):
    from bloomfilter_spark.operators.build import bloom_factory, build_sketch

    df = spark.createDataFrame([], "v string")
    sk = build_sketch(df, "v", bloom_factory(1024, 0.01))
    assert sk.popcount() == 0
    assert not sk.contains(pd.Series(["anything"])).any()


@given(
    st.integers(min_value=4, max_value=12),  # p: m = 16..4096 registers
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4095),
            st.integers(min_value=1, max_value=61),
        ),
        min_size=0,
        max_size=400,
    ),
)
@settings(max_examples=60, deadline=None)
def test_hll_blob_roundtrip_any_density(p, entries):
    """Sparse/dense blob self-sizing is an ENCODING, never semantics:
    any register state round-trips to the identical registers, estimate,
    and merge behavior, across the sparse/dense cutover."""
    import numpy as np

    from bloomfilter_spark.sketches import serde
    from bloomfilter_spark.sketches.hll import HyperLogLog

    h = HyperLogLog(p=p)
    m = 1 << p
    for idx, rank in entries:
        i = idx % m
        h.registers[i] = max(h.registers[i], min(rank, 64 - p + 1))
    h.n_added = len(entries)

    blob = h.to_bytes()
    back = HyperLogLog.from_bytes(blob)
    assert back == h and back.n_added == h.n_added
    assert back.estimate() == h.estimate()
    # deserialized state merges like the original
    other = HyperLogLog(p=p)
    other.update(["probe-a", "probe-b"])
    a = HyperLogLog.from_bytes(blob).merge(other)
    b = h.merge(other)  # h mutated after blob was taken — fine, compare now
    assert np.array_equal(a.registers, b.registers)
    # generic registry path sees the same sketch
    assert serde.deserialize(blob).p == p
