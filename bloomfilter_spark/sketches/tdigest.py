"""t-digest quantile sketch (Dunning & Ertl 2019) — north-rule companion.

Contract pattern cloned from the reference's Bloom rows (SURVEY.md §2.3).

Implementation: the *merging* t-digest with the k1 scale function
k(q) = δ·(asin(2q−1)/π + 1/2), built fully vectorized: a batch (points or
centroids) is sorted by (mean, weight), each item is assigned the k-space
bin of its cumulative-weight midpoint, and bins are reduced to
weight-averaged centroids with np.add.reduceat. ≤ δ centroids survive and
tail bins are exponentially narrow in q, giving the published t-digest
accuracy profile (rank error ~ O(q(1−q)/δ), tightest at the tails).

Determinism: compression sorts by (mean, weight) — any permutation of equal
items yields identical output, so a single n-ary merge (concat all partial
digests, compress once) is a pure function of the multiset of partials.
Distributed combines therefore use merge_all in canonical partition order
(operators/build.py), per the north rule's merge-order-independence
requirement (BASELINE.json:14).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from bloomfilter_spark.sketches import serde


@serde.register(serde.KIND_TDIGEST)
class TDigest:
    __slots__ = ("delta", "seed", "n_added", "means", "weights", "vmin", "vmax")

    def __init__(
        self,
        delta: int = 200,
        seed: int = 0,
        means=None,
        weights=None,
        n_added: int = 0,
        vmin: float = math.inf,
        vmax: float = -math.inf,
    ):
        if not isinstance(delta, int) or delta < 10 or delta > 10000:
            raise ValueError(f"tdigest: delta must be an integer in [10, 10000], got {delta}")
        self.delta = delta
        self.seed = int(seed)  # unused (no hashing); header parity
        self.n_added = int(n_added)
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)
        self.vmin = float(vmin)
        self.vmax = float(vmax)

    @classmethod
    def create(cls, delta: int = 200, seed: int = 0) -> "TDigest":
        return cls(delta=delta, seed=seed)

    def empty_like(self) -> "TDigest":
        return TDigest(self.delta, self.seed)

    # -- compression core -----------------------------------------------------

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        if means.size == 0:
            return means, weights
        order = np.lexsort((weights, means))
        m = means[order]
        w = weights[order]
        cw = np.cumsum(w)
        total = cw[-1]
        q_mid = (cw - w / 2.0) / total
        kval = self.delta * (np.arcsin(2.0 * q_mid - 1.0) / math.pi + 0.5)
        cid = np.minimum(np.floor(kval).astype(np.int64), self.delta - 1)
        starts = np.nonzero(np.diff(cid, prepend=cid[0] - 1))[0]
        gw = np.add.reduceat(w, starts)
        gm = np.add.reduceat(m * w, starts) / gw
        return gm, gw

    # -- update ---------------------------------------------------------------

    def update(self, values, weights=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        if weights is None:
            w = np.ones(v.size, dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)
            if w.size and not bool((np.isfinite(w) & (w > 0)).all()):
                # zero total weight makes _compress divide 0/0 and the NaN
                # centroids poison every later quantile with no error;
                # negative weights break the cumsum monotonicity binning
                raise ValueError(
                    "tdigest: weights must be finite and > 0"
                )
        # family-wide skip contract (see ddsketch.py): NaN AND ±inf dropped
        keep = np.isfinite(v)
        v, w = v[keep], w[keep]
        if v.size == 0:
            return
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        allm = np.concatenate([self.means, v])
        allw = np.concatenate([self.weights, w])
        self.means, self.weights = self._compress(allm, allw)
        self.n_added += int(v.size)

    # -- query ----------------------------------------------------------------

    def quantile(self, q) -> np.ndarray | float:
        """Interpolated quantile estimate."""
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if np.any((qs < 0) | (qs > 1)):
            raise ValueError("tdigest: quantile q must be in [0, 1]")
        if self.means.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if scalar else out
        m, w = self.means, self.weights
        total = w.sum()
        # centroid midpoints in cumulative-weight space
        cw = np.cumsum(w) - w / 2.0
        pts_x = np.concatenate([[0.0], cw, [total]])
        pts_y = np.concatenate([[self.vmin], m, [self.vmax]])
        out = np.interp(qs * total, pts_x, pts_y)
        return float(out[0]) if scalar else out

    def rank(self, x) -> np.ndarray | float:
        scalar = np.isscalar(x)
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(xs.shape, np.nan)
            return float(out[0]) if scalar else out
        total = self.weights.sum()
        cw = np.cumsum(self.weights) - self.weights / 2.0
        pts_x = np.concatenate([[self.vmin], self.means, [self.vmax]])
        pts_y = np.concatenate([[0.0], cw, [total]])
        out = np.interp(xs, pts_x, pts_y) / total
        return float(out[0]) if scalar else out

    # -- merge ----------------------------------------------------------------

    def _check_geometry(self, other: "TDigest") -> None:
        if self.delta != other.delta or self.seed != other.seed:
            raise ValueError("tdigest sketches must have same delta and seed for merge")

    def merge(self, other: "TDigest") -> "TDigest":
        return self.merge_all([other])

    def merge_all(self, others: list["TDigest"]) -> "TDigest":
        """n-ary merge: concat all centroids, compress once — a pure function
        of the multiset of inputs."""
        for o in others:
            self._check_geometry(o)
        allm = np.concatenate([self.means] + [o.means for o in others])
        allw = np.concatenate([self.weights] + [o.weights for o in others])
        self.means, self.weights = self._compress(allm, allw)
        self.n_added += sum(o.n_added for o in others)
        self.vmin = min([self.vmin] + [o.vmin for o in others])
        self.vmax = max([self.vmax] + [o.vmax for o in others])
        return self

    def clear(self) -> None:
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n_added = 0
        self.vmin = math.inf
        self.vmax = -math.inf

    def stats(self) -> dict:
        return {
            "delta": self.delta,
            "centroids": int(self.means.size),
            "total_weight": float(self.weights.sum()) if self.weights.size else 0.0,
            "min": self.vmin if self.n_added else None,
            "max": self.vmax if self.n_added else None,
            "memory_usage": int(self.means.nbytes + self.weights.nbytes),
            "n_added": self.n_added,
        }

    # -- serde ----------------------------------------------------------------

    def to_bytes(self) -> bytes:
        params = struct.pack("<IIdd", self.delta, self.means.size, self.vmin, self.vmax)
        payload = (
            np.ascontiguousarray(self.means, dtype="<f8").tobytes()
            + np.ascontiguousarray(self.weights, dtype="<f8").tobytes()
        )
        return serde.pack(serde.KIND_TDIGEST, self.seed, self.n_added, params, payload)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        kind, seed, n_added, params, payload = serde.unpack(blob)
        if kind != serde.KIND_TDIGEST:
            raise ValueError(f"not a tdigest blob (kind={kind})")
        delta, n, vmin, vmax = struct.unpack("<IIdd", params)
        flat = np.frombuffer(payload, dtype="<f8")
        if len(flat) < 2 * n:
            # a short slice would silently yield mismatched means/weights
            # and fail later with an opaque shape error — refuse like
            # DDSketch/KLL from_bytes
            raise ValueError(
                f"tdigest blob truncated: {len(flat)} floats, header "
                f"declares {2 * n}"
            )
        means = flat[:n].astype(np.float64)
        weights = flat[n : 2 * n].astype(np.float64)
        return cls(
            delta=delta,
            seed=seed,
            means=means,
            weights=weights,
            n_added=n_added,
            vmin=vmin,
            vmax=vmax,
        )

    def __eq__(self, other) -> bool:
        # vmin/vmax are the quantile interpolation anchors and n_added is
        # part of the blob: equal sketches must answer identically AND
        # round-trip identically, so all state participates
        return (
            isinstance(other, TDigest)
            and self.delta == other.delta
            and self.vmin == other.vmin
            and self.vmax == other.vmax
            and self.n_added == other.n_added
            and np.array_equal(self.means, other.means)
            and np.array_equal(self.weights, other.weights)
        )
