"""Bloom filter tests mirroring the reference suite:
/root/reference/bloomfilter_test.go, bloomfilter_validation_test.go,
tests/integration/bloomfilter_edge_cases_test.go."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bloomfilter_spark.sketches.bloom import BloomFilter
from bloomfilter_spark.sketches import serde
from tests.scalar_oracle import ScalarBloom


# -- add→contains round-trip (bloomfilter_test.go:9-96) ------------------------


def test_add_contains_strings():
    bf = BloomFilter.create(1000, 0.01)
    keys = [f"key-{i}" for i in range(500)]
    bf.update(keys)
    assert bf.contains(keys).all()
    assert bf.n_added == 500


def test_add_contains_ints():
    bf = BloomFilter.create(1000, 0.01)
    vals = np.arange(500, dtype=np.int64)
    bf.update(vals)
    assert bf.contains(vals).all()


def test_add_contains_bytes_including_empty():
    bf = BloomFilter.create(100, 0.01)
    items = [b"", b"a", b"hello world", b"\x00\x01\x02"]
    bf.update(items)
    assert bf.contains(items).all()


def test_empty_filter_contains_nothing():
    bf = BloomFilter.create(1000, 0.01)
    assert not bf.contains([f"k{i}" for i in range(100)]).any()
    assert bf.popcount() == 0


# -- Clear (bloomfilter_test.go:99-136) ----------------------------------------


def test_clear():
    bf = BloomFilter.create(1000, 0.01)
    bf.update(["a", "b", "c"])
    assert bf.popcount() > 0
    bf.clear()
    assert bf.popcount() == 0
    assert not bf.contains(["a", "b", "c"]).any()
    assert bf.n_added == 0


# -- PopCount monotone (bloomfilter_test.go:139-165) ---------------------------


def test_popcount_monotone():
    bf = BloomFilter.create(10000, 0.01)
    last = 0
    for chunk in range(10):
        bf.update([f"item-{chunk}-{i}" for i in range(100)])
        pc = bf.popcount()
        assert pc >= last
        last = pc
    assert last <= bf.m


# -- Union (bloomfilter_test.go:168-197) ---------------------------------------


def test_union_contains_both_sets():
    a = BloomFilter.create(1000, 0.01)
    b = BloomFilter.create(1000, 0.01)
    a.update([f"a{i}" for i in range(100)])
    b.update([f"b{i}" for i in range(100)])
    a.union(b)
    assert a.contains([f"a{i}" for i in range(100)]).all()
    assert a.contains([f"b{i}" for i in range(100)]).all()


def test_union_is_commutative_associative_bitwise():
    parts = []
    for p in range(4):
        bf = BloomFilter.create(1000, 0.01)
        bf.update([f"p{p}-{i}" for i in range(50)])
        parts.append(bf)
    import itertools

    results = []
    for perm in itertools.permutations(range(4)):
        acc = parts[perm[0]].empty_like()
        for j in perm:
            acc.union(parts[j])
        results.append(acc.words.copy())
    for r in results[1:]:
        assert np.array_equal(results[0], r)


# -- Intersection (bloomfilter_test.go:200-232) ---------------------------------


def test_intersection_keeps_shared():
    a = BloomFilter.create(1000, 0.01)
    b = BloomFilter.create(1000, 0.01)
    shared = [f"s{i}" for i in range(50)]
    a.update(shared + [f"a{i}" for i in range(50)])
    b.update(shared + [f"b{i}" for i in range(50)])
    a.intersection(b)
    # shared elements always survive (superset of true intersection,
    # same caveat as bloomfilter_test.go:230-231)
    assert a.contains(shared).all()


# -- size-mismatch errors (bloomfilter_test.go:235-250) --------------------------


def test_union_size_mismatch():
    a = BloomFilter.create(1000, 0.01)
    b = BloomFilter.create(100000, 0.01)
    with pytest.raises(ValueError, match="bloom filters must have same size for union"):
        a.union(b)


def test_intersection_size_mismatch():
    a = BloomFilter.create(1000, 0.01)
    b = BloomFilter.create(100000, 0.01)
    with pytest.raises(
        ValueError, match="bloom filters must have same size for intersection"
    ):
        a.intersection(b)


def test_seed_mismatch_refuses_merge():
    a = BloomFilter.create(1000, 0.01, seed=1)
    b = BloomFilter.create(1000, 0.01, seed=2)
    with pytest.raises(ValueError):
        a.union(b)


# -- stats sanity (bloomfilter_test.go:253-294) ----------------------------------


def test_stats_sanity():
    bf = BloomFilter.create(1000, 0.01)
    bf.update([f"k{i}" for i in range(500)])
    s = bf.stats()
    assert 0.0 <= s["load_factor"] <= 1.0
    assert 0.0 <= s["estimated_fpp"] <= 1.0
    assert s["bit_count"] == bf.m
    assert s["hash_count"] == bf.k
    assert s["bits_set"] == bf.popcount()
    assert s["bit_count"] % 512 == 0  # cache-line rounding parity
    assert s["memory_usage"] == bf.m // 8


# -- sizing math (bloomfilter.go:62-81) -------------------------------------------


def test_sizing_formulas():
    n, p = 10000, 0.01
    bf = BloomFilter.create(n, p)
    ln2 = math.log(2)
    m_raw = int(-n * math.log(p) / (ln2 * ln2))
    k = int(m_raw * ln2 / n)
    assert bf.k == k
    assert bf.m == ((m_raw + 511) // 512) * 512


# -- validation contract (bloomfilter_validation_test.go) -------------------------


def test_validation_zero_elements():
    with pytest.raises(ValueError, match="expectedElements must be greater than 0"):
        BloomFilter.create(0, 0.01)


@pytest.mark.parametrize("p", [0.0, -0.5, 1.0, 1.5, float("inf"), float("-inf")])
def test_validation_bad_rate(p):
    with pytest.raises(ValueError, match="falsePositiveRate must be in range"):
        BloomFilter.create(100, p)


def test_validation_nan():
    with pytest.raises(ValueError, match="falsePositiveRate cannot be NaN"):
        BloomFilter.create(100, float("nan"))


def test_validation_rate_too_high_for_n():
    # n=1, p=0.99 → bitCount truncates to 0 (bloomfilter.go:68-70)
    with pytest.raises(ValueError, match="results in zero bits"):
        BloomFilter.create(1, 0.99)


@pytest.mark.parametrize(
    "n,p",
    [(1, 0.01), (10, 0.001), (100, 0.1), (10**9, 0.01), (1000, 1e-7), (1000, 0.9)],
)
def test_validation_valid_matrix(n, p):
    # mirror bloomfilter_validation_test.go:180-222 (construct only; for
    # n=10^9 the array is ~1.2GB of zeros — skip materializing)
    if n >= 10**9:
        ln2 = math.log(2)
        m = int(-n * math.log(p) / (ln2 * ln2))
        assert m > 0
        return
    bf = BloomFilter.create(n, p)
    assert bf.m >= 512
    assert bf.k >= 1


# -- FPP invariants (bloomfilter_test.go:338-370) ----------------------------------


def test_zero_false_negatives_and_fpp_within_2x():
    # n=10k capacity, 5k inserted, 10k negative probes — exactly the
    # reference's design point
    bf = BloomFilter.create(10000, 0.01)
    inserted = [f"present-{i}" for i in range(5000)]
    bf.update(inserted)
    assert bf.contains(inserted).all(), "FALSE NEGATIVE detected"
    negatives = [f"absent-{i}" for i in range(10000)]
    fp = int(bf.contains(negatives).sum())
    fpp = fp / len(negatives)
    assert fpp <= 2 * 0.01, f"observed FPP {fpp} > 2x target"


def test_estimated_fpp_tracks_observed():
    bf = BloomFilter.create(10000, 0.01)
    bf.update([f"x{i}" for i in range(10000)])
    est = bf.estimated_fpp()
    fp = int(bf.contains([f"neg{i}" for i in range(20000)]).sum())
    obs = fp / 20000
    assert abs(est - obs) < 0.02


def test_estimated_cardinality():
    bf = BloomFilter.create(10000, 0.01)
    bf.update([f"c{i}" for i in range(5000)])
    est = bf.estimated_cardinality()
    assert abs(est - 5000) / 5000 < 0.05


# -- k>16 heap path analog (edge_cases_test.go:144-166) -----------------------------


def test_large_k():
    bf = BloomFilter.create(1000, 1e-7)
    assert bf.k > 16
    keys = [f"deep-{i}" for i in range(200)]
    bf.update(keys)
    assert bf.contains(keys).all()


@pytest.mark.parametrize("n", [1, 10, 100])
def test_tiny_filters(n):
    # edge_cases_test.go:66-98
    bf = BloomFilter.create(n, 0.01)
    keys = [f"t{i}" for i in range(n)]
    bf.update(keys)
    assert bf.contains(keys).all()


@pytest.mark.parametrize("p", [1e-6, 1e-4, 0.01, 0.1])
def test_fpr_range(p):
    # edge_cases_test.go:101-141
    bf = BloomFilter.create(1000, p)
    bf.update([f"r{i}" for i in range(1000)])
    assert bf.contains([f"r{i}" for i in range(1000)]).all()


# -- differential: vectorized vs scalar oracle --------------------------------------


def test_vectorized_matches_scalar_bloom_bit_for_bit():
    bf = BloomFilter.create(500, 0.01)
    oracle = ScalarBloom(bf.m, bf.k, bf.seed)
    items = [f"diff-{i}".encode() for i in range(300)] + [b"", b"\x00", b"x" * 100]
    bf.update(items)
    for b in items:
        oracle.add(b)
    assert oracle.words_equal(bf.words), "vectorized bitset != scalar oracle bitset"
    probes = items + [f"probe-{i}".encode() for i in range(300)]
    got = bf.contains(probes)
    for i, b in enumerate(probes):
        assert bool(got[i]) == oracle.contains(b)


# -- serde ---------------------------------------------------------------------------


def test_blob_roundtrip():
    bf = BloomFilter.create(1000, 0.01)
    bf.update([f"s{i}" for i in range(100)])
    blob = bf.to_bytes()
    back = BloomFilter.from_bytes(blob)
    assert back == bf
    assert back.n_added == bf.n_added
    assert serde.deserialize(blob) == bf


def test_blob_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        serde.unpack(b"XXXX" + b"\x00" * 40)


def test_staged_and_direct_scatter_bit_identical(monkeypatch):
    """The byte-per-bit staging path and the >64MB-filter direct ufunc.at
    path must produce identical bit patterns for the same inserts."""
    import numpy as np

    from bloomfilter_spark.sketches import bloom as bloom_mod

    keys = np.arange(50_000, dtype=np.int64)
    a = bloom_mod.BloomFilter.create(60_000, 0.01)
    for i in range(0, len(keys), 8192):
        a.update(keys[i : i + 8192])

    monkeypatch.setattr(bloom_mod, "_STAGE_MAX_BITS", 0)
    b = bloom_mod.BloomFilter.create(60_000, 0.01)
    for i in range(0, len(keys), 8192):
        b.update(keys[i : i + 8192])
    assert b._stage is None  # direct path never staged
    assert np.array_equal(a.words, b.words)
    assert a.to_bytes() == b.to_bytes()
