"""BlockedBloomFilter (cache-line-blocked layout, Putze et al. 2009):
the same reference test-gate contract as the flat filter — zero false
negatives, observed FPP within the acceptance band
(/root/reference/bloomfilter_test.go:338-370) — plus the blocked-specific
invariants: every key's k bits live in ONE 512-bit block and are k
DISTINCT bits, merges are bit-identical regardless of partitioning, and a
blocked blob/filter can never silently merge into a flat one."""

from __future__ import annotations

import numpy as np
import pytest

from bloomfilter_spark.functions.hashing import hash_any
from bloomfilter_spark.sketches import serde
from bloomfilter_spark.sketches.blocked import BlockedBloomFilter, blocked_bloom_factory
from bloomfilter_spark.sketches.bloom import BloomFilter

N = 100_000


def _keys(n: int = N) -> np.ndarray:
    return (np.arange(n, dtype=np.int64) * 2654435761) % (1 << 62)


@pytest.fixture(scope="module")
def built() -> tuple[BlockedBloomFilter, np.ndarray]:
    bf = BlockedBloomFilter.create(N, 0.01)
    keys = _keys()
    for i in range(0, N, 8192):  # Arrow-batch-shaped updates
        bf.update(keys[i : i + 8192])
    return bf, keys


def test_sizing_inherits_flat_contract():
    bf = BlockedBloomFilter.create(N, 0.01)
    flat = BloomFilter.create(N, 0.01)
    assert (bf.m, bf.k) == (flat.m, flat.k)
    assert bf.m % 512 == 0
    assert bf.n_blocks == bf.m // 512


def test_zero_false_negatives(built):
    bf, keys = built
    assert bf.contains(keys).all()
    assert bf.n_added == N


def test_observed_fpp_within_band(built):
    """Blocking inflates FPP by ~1.1-1.3x at 512-bit blocks (Poisson
    block-load convexity); the reference acceptance band is <= 2x."""
    bf, keys = built
    fp = float(bf.contains(keys + np.int64(1)).mean())
    assert fp <= 2 * 0.01
    assert fp >= 0.005  # sanity: the filter is actually loaded


def test_estimated_fpp_tracks_observed(built):
    bf, keys = built
    fp = float(bf.contains(keys + np.int64(1)).mean())
    est = bf.estimated_fpp()
    assert 0.5 * fp <= est <= 2 * fp
    # and the blocked estimator sits ABOVE the naive flat formula, which
    # ignores block-load imbalance
    naive = (bf.popcount() / bf.m) ** bf.k
    assert est >= naive


def test_cardinality_estimate(built):
    bf, _ = built
    assert abs(bf.estimated_cardinality() - N) / N < 0.05


def test_all_k_bits_in_one_block_and_distinct(built):
    bf, keys = built
    h1, h2 = hash_any(keys[:2000], bf.seed)
    pos = bf._positions(h1, h2)
    blocks = pos >> np.uint64(9)
    assert (blocks == blocks[:, :1]).all()  # one cache line per key
    assert (blocks < bf.n_blocks).all()
    # odd in-block step => full cycle mod 512 => k distinct bits
    srt = np.sort(pos, axis=1)
    assert (srt[:, 1:] != srt[:, :-1]).all()


def test_contains_matches_full_position_matrix(built):
    """The lane-at-a-time early-out probe must be bit-equivalent to
    evaluating every position of the (n, k) matrix."""
    bf, keys = built
    probes = np.concatenate([keys[:5000], keys[:5000] + np.int64(1)])
    h1, h2 = hash_any(probes, bf.seed)
    pos = bf._positions(h1, h2)
    words = bf.words
    bits = (
        words[(pos >> np.uint64(6)).view(np.int64)] >> (pos & np.uint64(63))
    ) & np.uint64(1)
    assert np.array_equal(bf.contains_hashes(h1, h2), bits.all(axis=1))


def test_merge_partitioning_and_order_independent(built):
    bf, keys = built
    _ = bf.words
    for n_parts in (2, 7):
        parts = []
        for j in range(n_parts):
            p = bf.empty_like()
            p.update(keys[j::n_parts])
            parts.append(p)
        fwd = parts[0].empty_like()
        for p in parts:
            fwd.union(p)
        rev = parts[0].empty_like()
        for p in reversed(parts):
            rev.union(p)
        assert np.array_equal(fwd.words, rev.words)
        assert np.array_equal(fwd.words, bf.words)
        assert fwd.n_added == N


def test_staging_and_direct_scatter_agree(monkeypatch):
    """The adaptive add path (byte-per-bit stage vs direct scatter-OR)
    must produce identical bits.  The direct path is FORCED by zeroing
    the staging cap — tiny batches alone would still cross the
    break-even after ~15 of 313 updates and silently re-enter staging."""
    from bloomfilter_spark.sketches import bloom as bloom_mod

    keys = _keys(5000)
    small = BlockedBloomFilter.create(5000, 0.01)
    small.update(keys)  # staging path (m well under the cap)
    assert small._stage is not None  # precondition: really staged
    monkeypatch.setattr(bloom_mod, "_STAGE_MAX_BITS", 0)
    direct = small.empty_like()
    for i in range(0, 5000, 16):
        direct.update(keys[i : i + 16])
    assert direct._stage is None  # precondition: really direct
    assert np.array_equal(small.words, direct.words)


def test_serde_roundtrip(built):
    bf, keys = built
    rt = serde.deserialize(bf.to_bytes())
    assert type(rt) is BlockedBloomFilter
    assert rt == bf
    assert rt.contains(keys[:100]).all()


def test_serde_kind_guard(built):
    bf, _ = built
    flat = BloomFilter.create(N, 0.01)
    with pytest.raises(ValueError, match="not a blocked-bloom blob"):
        BlockedBloomFilter.from_bytes(flat.to_bytes())
    with pytest.raises(ValueError, match="not a bloom blob"):
        BloomFilter.from_bytes(bf.to_bytes())


def test_cross_layout_merge_rejected(built):
    """Same (m, k, seed) but different position maps: merging would
    corrupt both filters' semantics, so layout is geometry."""
    bf, _ = built
    flat = BloomFilter(m=bf.m, k=bf.k, seed=bf.seed)
    with pytest.raises(ValueError, match="same size"):
        flat.union(bf)
    with pytest.raises(ValueError, match="same size"):
        bf.intersection(flat)
    assert bf != flat


def test_factory_pickle_safe(built):
    """Factories cross the executor boundary via Spark's cloudpickle."""
    from pyspark import cloudpickle

    make = blocked_bloom_factory(1000, 0.01)
    clone = cloudpickle.loads(cloudpickle.dumps(make))
    bf = clone()
    assert type(bf) is BlockedBloomFilter
    bf.update(["a", "b"])
    assert bf.contains(["a", "b"]).all()
    assert not bf.contains([f"zz{i}" for i in range(50)]).all()


def test_validation_messages_inherited():
    with pytest.raises(ValueError, match="expectedElements must be greater"):
        BlockedBloomFilter.create(0, 0.01)
    with pytest.raises(ValueError, match="falsePositiveRate must be in range"):
        BlockedBloomFilter.create(100, 1.5)


def test_ragged_geometry_rejected():
    """m must tile into whole 512-bit blocks — a ragged tail would index
    past the word array (create() always rounds up; the raw constructor
    and blob paths must be guarded too)."""
    with pytest.raises(ValueError, match="multiple of 512"):
        BlockedBloomFilter(m=64, k=3)
    with pytest.raises(ValueError, match="multiple of 512"):
        BlockedBloomFilter(m=0, k=1)
    b = BlockedBloomFilter(m=1024, k=3)  # exact multiple: fine
    b.update(["x"])
    assert b.contains(["x"]).all()
