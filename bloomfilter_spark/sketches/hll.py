"""HyperLogLog — mergeable distinct-count sketch (north-rule companion).

No reference code exists for this (the reference is Bloom-only); the
*contract pattern* — sizing-from-accuracy constructor with strict validation,
geometry-checked associative merge, stats introspection, published error
bound (±1.04/√m standard error, Flajolet et al. 2007) — is cloned from the
Bloom rows of SURVEY.md §2.

State: 2^p uint8 registers. Update uses the h1 lane of murmur3 x64-128:
register index = top p bits, rank = leading-zero count of the remaining
64-p bits + 1. Merge = elementwise max (commutative, associative,
idempotent ⇒ bit-identical regardless of merge order, like Bloom's OR).

Estimator: classic HLL with linear-counting small-range correction.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from bloomfilter_spark.functions.hashing import DEFAULT_SEED, hash_any
from bloomfilter_spark.sketches import serde

U64 = np.uint64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (6 masked passes)."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = (x >> U64(shift)) != 0
        n[big] += shift
        x[big] >>= U64(shift)
    n += (x != 0).astype(np.int64)
    return n


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@serde.register(serde.KIND_HLL)
class HyperLogLog:
    """Dense HLL with 2**p registers."""

    __slots__ = ("p", "m", "seed", "n_added", "registers")

    # p u32, enc u8 (0 = dense registers, 1 = sparse (u32 idx, u8 rank)
    # pairs), pad.  Old blobs packed "<I4x" — their pad bytes read back as
    # enc 0, so every pre-existing dense blob stays parseable.
    _PARAMS = struct.Struct("<IB3x")

    def __init__(self, p: int = 14, seed: int = DEFAULT_SEED, registers=None, n_added: int = 0):
        if not isinstance(p, int) or p < 4 or p > 18:
            raise ValueError(f"hyperloglog: precision p must be an integer in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.seed = int(seed)
        self.n_added = int(n_added)
        if registers is None:
            registers = np.zeros(self.m, dtype=np.uint8)
        self.registers = registers

    @classmethod
    def create(cls, relative_error: float = 0.0104, seed: int = DEFAULT_SEED) -> "HyperLogLog":
        """Size from a target standard error: rse = 1.04/√m ⇒ m = (1.04/rse)²."""
        if not (0 < relative_error < 1) or math.isnan(relative_error):
            raise ValueError(
                f"hyperloglog: relativeError must be in range (0, 1), got {relative_error:f}"
            )
        m_needed = (1.04 / relative_error) ** 2
        p = max(4, math.ceil(math.log2(m_needed)))
        if p > 18:
            # silently clamping would return a sketch with WORSE error
            # than requested — refuse like every other bad-sizing input
            raise ValueError(
                f"hyperloglog: relativeError {relative_error:g} needs "
                f"precision {p} > 18 (max); smallest supported is "
                f"{1.04 / math.sqrt(2 ** 18):.6f}"
            )
        return cls(p=p, seed=seed)

    def empty_like(self) -> "HyperLogLog":
        return HyperLogLog(self.p, self.seed)

    @property
    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    # -- update ---------------------------------------------------------------

    def add_hashes(self, h1: np.ndarray, _h2: np.ndarray = None) -> None:
        if len(h1) == 0:
            return
        idx = (h1 >> U64(64 - self.p)).astype(np.int64)
        with np.errstate(over="ignore"):
            w = h1 << U64(self.p)
        rank = np.where(w == 0, 64 - self.p + 1, 64 - _bit_length_u64(w) + 1).astype(
            np.uint8
        )
        # unbuffered scatter-max: duplicate-safe, ~30x faster than the
        # lexsort group-max it replaces
        np.maximum.at(self.registers, idx, rank)
        self.n_added += len(h1)

    def update(self, values) -> None:
        h1, h2 = hash_any(values, self.seed)
        self.add_hashes(h1, h2)

    # -- query ----------------------------------------------------------------

    def estimate(self) -> float:
        reg = self.registers.astype(np.float64)
        est = _alpha(self.m) * self.m * self.m / np.sum(np.exp2(-reg))
        if est <= 2.5 * self.m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros > 0:
                return self.m * math.log(self.m / zeros)
        return float(est)

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    # -- merge ----------------------------------------------------------------

    def _check_geometry(self, other: "HyperLogLog") -> None:
        if self.p != other.p or self.seed != other.seed:
            raise ValueError("hyperloglog sketches must have same precision and seed for merge")

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self._check_geometry(other)
        np.maximum(self.registers, other.registers, out=self.registers)
        self.n_added += other.n_added
        return self

    def union_estimate(self, other: "HyperLogLog") -> float:
        """|A ∪ B| without mutating either side (register max is lossless:
        the union sketch IS the sketch of the union stream)."""
        self._check_geometry(other)
        u = HyperLogLog(
            self.p, self.seed,
            registers=np.maximum(self.registers, other.registers),
        )
        return u.estimate()

    def intersection_estimate(self, other: "HyperLogLog") -> float:
        """|A ∩ B| by inclusion-exclusion: |A| + |B| − |A ∪ B|.

        Unlike union this is NOT lossless — the absolute error is relative
        to the UNION size (each term carries ±1.04/√m of its own value), so
        it degrades when the intersection is tiny vs the union.  Clamped at
        0 (inclusion-exclusion can go negative for disjoint sets)."""
        return max(
            0.0,
            self.estimate() + other.estimate() - self.union_estimate(other),
        )

    def clear(self) -> None:
        self.registers.fill(0)
        self.n_added = 0

    def stats(self) -> dict:
        nonzero = int(np.count_nonzero(self.registers))
        return {
            "precision": self.p,
            "registers": self.m,
            "registers_nonzero": nonzero,
            "relative_error": self.relative_error,
            "estimate": self.estimate(),
            "memory_usage": self.registers.nbytes,
            "n_added": self.n_added,
        }

    # -- serde ----------------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Self-sizing blob: sparse (u32 idx, u8 rank) pairs when that is
        smaller than the dense register array, dense otherwise.

        Encoding only — both forms reconstruct the identical register
        state, so estimates, merges, and geometry checks are unaffected.
        The win is shuffle/checkpoint width for GROUPED builds: a rollup
        over millions of hosts/days carries one blob per group, and most
        groups touch far fewer than m/5 registers — a singleton group's
        blob drops from m bytes (16 KB at p=14) to ~25 bytes."""
        nz = np.flatnonzero(self.registers)
        if 5 * len(nz) < self.m:
            payload = (
                nz.astype("<u4").tobytes() + self.registers[nz].tobytes()
            )
            enc = 1
        else:
            payload = self.registers.tobytes()
            enc = 0
        return serde.pack(
            serde.KIND_HLL,
            self.seed,
            self.n_added,
            self._PARAMS.pack(self.p, enc),
            payload,
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        kind, seed, n_added, params, payload = serde.unpack(blob)
        if kind != serde.KIND_HLL:
            raise ValueError(f"not an hll blob (kind={kind})")
        p, enc = cls._PARAMS.unpack(params)
        m = 1 << p
        if enc == 0:
            if len(payload) != m:
                raise ValueError(
                    f"hll blob: payload is {len(payload)} bytes, expected {m} "
                    f"for p={p} (truncated or corrupt)"
                )
            registers = np.frombuffer(payload, dtype=np.uint8).copy()
        elif enc == 1:
            if len(payload) % 5 != 0:
                raise ValueError(
                    f"hll blob: sparse payload of {len(payload)} bytes is not "
                    "a whole number of (u32 idx, u8 rank) entries (truncated "
                    "or corrupt)"
                )
            nnz = len(payload) // 5
            idx = np.frombuffer(payload[: 4 * nnz], dtype="<u4").astype(np.int64)
            rank = np.frombuffer(payload[4 * nnz :], dtype=np.uint8)
            if nnz and int(idx.max()) >= m:
                raise ValueError(
                    f"hll blob: sparse register index {int(idx.max())} out of "
                    f"range for p={p} (corrupt)"
                )
            registers = np.zeros(m, dtype=np.uint8)
            registers[idx] = rank
        else:
            raise ValueError(f"hll blob: unknown register encoding {enc}")
        return cls(p=p, seed=seed, registers=registers, n_added=n_added)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, HyperLogLog)
            and self.p == other.p
            and self.seed == other.seed
            and bool(np.array_equal(self.registers, other.registers))
        )
