"""Slow scalar oracles for differential testing.

The reference validates its SIMD kernels against scalar fallbacks
(/root/reference/tests/integration/bloomfilter_simd_comparison_test.go:280-381).
Our analog: the vectorized numpy implementations must agree with these
straightforward per-row Python ports.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128_scalar(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Canonical MurmurHash3_x64_128, straight port of the public domain
    reference algorithm (Austin Appleby, smhasher)."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    length = len(data)
    nblocks = length // 16
    h1 = seed & MASK64
    h2 = seed & MASK64

    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * c1) & MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & MASK64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64
        k2 = (k2 * c2) & MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & MASK64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64

    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    t = len(tail)
    if t >= 9:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * c2) & MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & MASK64
        h2 ^= k2
    if t >= 1:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * c1) & MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    return h1, h2


class ScalarBloom:
    """Per-row Python Bloom filter using the same geometry + hash as the
    vectorized one (the 'purego fallback' analog, /root/reference/Makefile:121-124)."""

    def __init__(self, m: int, k: int, seed: int):
        self.m = m
        self.k = k
        self.seed = seed
        self.bits = bytearray(m // 8)

    def _positions(self, data: bytes):
        h1, h2 = murmur3_x64_128_scalar(data, self.seed)
        # uint64 wraparound BEFORE mod, matching numpy/Go semantics
        return [((h1 + i * h2) & MASK64) % self.m for i in range(self.k)]

    def add(self, data: bytes) -> None:
        for pos in self._positions(data):
            self.bits[pos >> 3] |= 1 << (pos & 7)

    def contains(self, data: bytes) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(data))

    def words_equal(self, words) -> bool:
        import numpy as np

        mine = np.frombuffer(bytes(self.bits), dtype=np.uint64)
        return bool(np.array_equal(mine, words))
