"""KLL quantile sketch (Karnin–Lang–Liberty 2016) — north-rule companion.

Contract pattern cloned from the reference's Bloom rows (SURVEY.md §2.3):
accuracy-driven constructor, strict validation, geometry-checked merge,
stats introspection, published rank-error bound (ε ≈ O(1/k); for k = 200
the expected normalized rank error is ≈ 1.65% as published for the
DataSketches implementation of the same algorithm).

Determinism: the classic algorithm flips a random coin per compaction to
pick even/odd survivors. We derive the offset bit deterministically from
(level, pair count) instead, so a sketch's value is a pure function of the
multiset of inputs and the compaction schedule. Distributed merges are done
n-ary (concat all partials per level, then compact once) in canonical
partition order — see operators/build.py — giving identical results for
identical partition sets regardless of task scheduling order
(BASELINE.json:14 merge-associativity requirement).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from bloomfilter_spark.sketches import serde

_MIN_LEVEL_CAP = 8
_C = 2.0 / 3.0


@serde.register(serde.KIND_KLL)
class KLLSketch:
    __slots__ = ("k", "seed", "n_added", "levels")

    def __init__(self, k: int = 200, seed: int = 0, levels=None, n_added: int = 0):
        if not isinstance(k, int) or k < 8 or k > 65535:
            raise ValueError(f"kll: k must be an integer in [8, 65535], got {k}")
        self.k = k
        self.seed = int(seed)  # unused (no hashing) but kept for header parity
        self.n_added = int(n_added)
        self.levels: list[np.ndarray] = levels if levels is not None else [
            np.empty(0, dtype=np.float64)
        ]

    @classmethod
    def create(cls, k: int = 200, seed: int = 0) -> "KLLSketch":
        return cls(k=k, seed=seed)

    def empty_like(self) -> "KLLSketch":
        return KLLSketch(self.k, self.seed)

    # -- capacities -----------------------------------------------------------

    def _cap(self, h: int, num_levels: int) -> int:
        """Capacity of level h when the sketch has num_levels levels."""
        depth = num_levels - 1 - h
        return max(_MIN_LEVEL_CAP, int(math.ceil(self.k * (_C**depth))))

    def _total_cap(self) -> int:
        nl = len(self.levels)
        return sum(self._cap(h, nl) for h in range(nl))

    # -- update ---------------------------------------------------------------

    def update(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        # family-wide skip contract (see ddsketch.py): NaN AND ±inf are
        # dropped — an inf would poison every rank above it
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n_added += int(v.size)
        self._compress()

    def _compress(self) -> None:
        """Compact while total items exceed total capacity: find the lowest
        over-full level, sort it, promote alternating survivors."""
        while sum(arr.size for arr in self.levels) > self._total_cap():
            nl = len(self.levels)
            for h in range(nl):
                if self.levels[h].size >= self._cap(h, nl):
                    self._compact_level(h)
                    break
            else:
                # nothing individually over cap but total over: compact level 0
                self._compact_level(0)

    def _compact_level(self, h: int) -> None:
        arr = np.sort(self.levels[h], kind="stable")
        n_pairs = arr.size // 2
        if n_pairs == 0:
            # can't compact a single item; grow a level instead
            if h + 1 >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            return
        odd = arr.size - 2 * n_pairs
        # deterministic offset replaces the classic random coin
        offset = (h + n_pairs) % 2
        survivors = arr[offset : 2 * n_pairs : 2]
        leftover = arr[2 * n_pairs :] if odd else np.empty(0, dtype=np.float64)
        self.levels[h] = leftover
        if h + 1 >= len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], survivors])

    # -- query ----------------------------------------------------------------

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = []
        wts = []
        for h, arr in enumerate(self.levels):
            if arr.size:
                vals.append(arr)
                wts.append(np.full(arr.size, 2**h, dtype=np.int64))
        if not vals:
            return np.empty(0, dtype=np.float64), np.empty(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray | float:
        """Value whose rank is ≈ q·N (lower-bound rule: smallest item whose
        cumulative weight ≥ q·N)."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if np.any((qs < 0) | (qs > 1)):
            raise ValueError("kll: quantile q must be in [0, 1]")
        v, w = self._weighted_items()
        if v.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        cw = np.cumsum(w)
        total = cw[-1]
        targets = np.clip(qs * total, 1, total)
        idx = np.searchsorted(cw, targets, side="left")
        out = v[np.minimum(idx, v.size - 1)]
        return float(out[0]) if scalar else out

    def rank(self, x) -> np.ndarray | float:
        """Estimated normalized rank of x: fraction of items ≤ x."""
        scalar = np.isscalar(x)
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        v, w = self._weighted_items()
        if v.size == 0:
            out = np.full(xs.shape, np.nan)
            return float(out[0]) if scalar else out
        cw = np.concatenate([[0], np.cumsum(w)])
        idx = np.searchsorted(v, xs, side="right")
        out = cw[idx] / cw[-1]
        return float(out[0]) if scalar else out

    def rank_error(self) -> float:
        """Published normalized rank-error estimate for this k (~1.65% at
        k=200, scaling as 1/k)."""
        return 1.65 * (200.0 / self.k) / 100.0

    # -- merge ----------------------------------------------------------------

    def _check_geometry(self, other: "KLLSketch") -> None:
        if self.k != other.k or self.seed != other.seed:
            raise ValueError("kll sketches must have same k and seed for merge")

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        return self.merge_all([other])

    def merge_all(self, others: list["KLLSketch"]) -> "KLLSketch":
        """n-ary merge: concat every level across all inputs, then compact
        once. Result depends only on the multiset of input sketches."""
        for o in others:
            self._check_geometry(o)
        max_levels = max([len(self.levels)] + [len(o.levels) for o in others])
        new_levels = []
        for h in range(max_levels):
            parts = []
            if h < len(self.levels) and self.levels[h].size:
                parts.append(self.levels[h])
            for o in others:
                if h < len(o.levels) and o.levels[h].size:
                    parts.append(o.levels[h])
            if parts:
                # canonical order within a level: sorted values
                new_levels.append(np.sort(np.concatenate(parts), kind="stable"))
            else:
                new_levels.append(np.empty(0, dtype=np.float64))
        self.levels = new_levels
        self.n_added += sum(o.n_added for o in others)
        self._compress()
        return self

    def clear(self) -> None:
        self.levels = [np.empty(0, dtype=np.float64)]
        self.n_added = 0

    def stats(self) -> dict:
        return {
            "k": self.k,
            "levels": len(self.levels),
            "retained": int(sum(a.size for a in self.levels)),
            "rank_error": self.rank_error(),
            "memory_usage": int(sum(a.nbytes for a in self.levels)),
            "n_added": self.n_added,
        }

    # -- serde ----------------------------------------------------------------

    def to_bytes(self) -> bytes:
        nl = len(self.levels)
        params = struct.pack(f"<II{nl}q", self.k, nl, *[a.size for a in self.levels])
        payload = b"".join(np.ascontiguousarray(a, dtype="<f8").tobytes() for a in self.levels)
        return serde.pack(serde.KIND_KLL, self.seed, self.n_added, params, payload)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        kind, seed, n_added, params, payload = serde.unpack(blob)
        if kind != serde.KIND_KLL:
            raise ValueError(f"not a kll blob (kind={kind})")
        k, nl = struct.unpack_from("<II", params, 0)
        sizes = struct.unpack_from(f"<{nl}q", params, 8)
        flat = np.frombuffer(payload, dtype="<f8")
        if len(flat) < sum(sizes):
            # a short slice would silently drop the HIGHEST-weight items
            # and skew every quantile — refuse like Bloom/HLL from_bytes
            raise ValueError(
                f"kll blob truncated: {len(flat)} values, level sizes "
                f"declare {sum(sizes)}"
            )
        levels = []
        off = 0
        for s in sizes:
            levels.append(flat[off : off + s].astype(np.float64))
            off += s
        return cls(k=k, seed=seed, levels=levels, n_added=n_added)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, KLLSketch)
            and self.k == other.k
            and len(self.levels) == len(other.levels)
            and all(np.array_equal(a, b) for a, b in zip(self.levels, other.levels))
        )
