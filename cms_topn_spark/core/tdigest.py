"""Merging t-digest under the shared mergeable protocol (SURVEY.md §2.3).

Follows Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests" (2019): centroids sorted by mean, compressed with the k1 scale
function ``k(q) = (delta / 2π) · asin(2q − 1)`` which concentrates resolution
at the tails. Everything is deterministic (no RNG), so equal inputs produce
byte-equal states.

Exactness regime for the correctness gate: with ``delta >= π·N`` no two points
ever share a centroid, every weight stays 1, and ``quantile(q)`` falls back to
exact linear interpolation at rank q*(N-1) — bit-equal to DuckDB's
``quantile_cont``. At production ``delta`` (100-1000) the published accuracy
behavior applies.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .base import KIND_TDIGEST, MergeableSketch, frame_guarded, SketchError, register

_FIXED = struct.Struct("<dQQ")  # delta, n_centroids, n


@register(KIND_TDIGEST)
class TDigest(MergeableSketch):
    def __init__(self, delta: float = 100.0):
        if delta < 1:
            raise SketchError("t-digest delta has to be at least 1")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0

    # ---------------- compression ----------------

    def _k(self, q: np.ndarray | float) -> np.ndarray | float:
        return self.delta / (2 * math.pi) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Merge a sorted centroid stream into at most O(delta) centroids."""
        total = weights.sum()
        if total == 0:
            self.means = np.empty(0)
            self.weights = np.empty(0)
            return
        # Exact-regime fast path: the greedy rule merges neighbors iff
        # k((cum+proposed)/total) − k(cum/total) ≤ 1. k'(q) ≥ delta/π
        # (minimum at q = 1/2), and proposed ≥ 2 whenever every weight is
        # ≥ 1, so the k-increment of any candidate merge is at least
        # 2·delta/(π·total) — strictly > 1 for delta ≥ π·total (2× margin,
        # so float rounding cannot flip it). No merge can fire: the output
        # IS the input, byte-for-byte what the scalar loop would append.
        # This turns the exact-regime gates (delta ≥ πN) from a Python
        # loop over every point into O(1).
        if self.delta >= math.pi * total and (
            len(weights) == 0 or weights.min() >= 1.0
        ):
            self.means = np.asarray(means, dtype=np.float64)
            self.weights = np.asarray(weights, dtype=np.float64)
            return
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = means[0], weights[0]
        cum = 0.0  # weight fully to the left of the current centroid
        k_lo = self._k(0.0)
        for i in range(1, len(means)):
            proposed = cur_w + weights[i]
            if self._k((cum + proposed) / total) - k_lo <= 1.0:
                cur_m += (means[i] - cur_m) * (weights[i] / proposed)
                cur_w = proposed
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                k_lo = self._k(cum / total)
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # ---------------- add ----------------

    def add_batch(self, values, counts=None, type_tag=None) -> None:
        """Weighted adds supported natively (each value becomes a centroid of
        weight count). None and NaN values are dropped uniformly regardless of
        container type — list and ndarray inputs build identical digests."""
        if not isinstance(values, np.ndarray):
            values = np.asarray(
                [np.nan if v is None else v for v in values], dtype=np.float64
            )
        arr = np.asarray(values, dtype=np.float64)
        if counts is None:
            w = np.ones(len(arr))
        else:
            w = np.asarray(counts, dtype=np.float64)
            if len(w) != len(arr):
                raise SketchError("counts length must match values length")
            if w.size and w.min() < 0:
                raise SketchError("item counts must be non-negative")
        keep = ~np.isnan(arr) & (w > 0)
        arr, w = arr[keep], w[keep]
        if len(arr) == 0:
            return
        # one stable argsort of the concatenation: pre-sorting the batch
        # first is redundant — a stable sort keeps equal values in input
        # order either way, so the (mean, weight) stream _compress sees is
        # identical
        m = np.concatenate([self.means, arr])
        ww = np.concatenate([self.weights, w])
        order = np.argsort(m, kind="stable")
        self.n += int(w.sum())
        self._compress(m[order], ww[order])

    # ---------------- query ----------------

    def quantile(self, q: float) -> float | None:
        if self.n == 0 or len(self.means) == 0:
            return None
        m, w = self.means, self.weights
        total = w.sum()
        if np.all(w == 1.0):
            # exact regime: identical to quantile_cont — DuckDB weights the
            # interpolation a·(ceil(t)−t) + b·(t−floor(t)), which differs in
            # the last ulp from a·(1−f)+b·f when t itself carries rounding
            # error (see kll.quantile for the derivation)
            t = q * (total - 1.0)
            fl = np.floor(t)
            i = min(int(fl), len(m) - 1)
            frac = t - fl
            if frac == 0.0:
                return float(m[i])
            j = min(i + 1, len(m) - 1)
            return float(m[i] * ((fl + 1.0) - t) + m[j] * frac)
        # heavy centroids (weight > 1, from weighted adds or compression) own
        # a mass SLAB, not a point: anchor each centroid at half a unit inside
        # each end of its slab (both anchors share its mean, so any target
        # inside the slab returns the mean exactly), then interpolate
        # piecewise-linearly between anchors — mid-point interpolation across
        # a 99-weight centroid would otherwise bleed a far neighbor's value
        # into the median
        target = q * total
        left = np.cumsum(w) - w  # mass strictly left of each centroid
        pos = np.empty(2 * len(m))
        val = np.empty(2 * len(m))
        pos[0::2] = left + np.minimum(w, 1.0) / 2.0
        pos[1::2] = left + w - np.minimum(w, 1.0) / 2.0
        val[0::2] = m
        val[1::2] = m
        return float(np.interp(target, pos, val))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def mean(self) -> float | None:
        if self.n == 0:
            return None
        return float((self.means * self.weights).sum() / self.weights.sum())

    # ---------------- merge ----------------

    def merge(self, other: "TDigest") -> "TDigest":
        if not isinstance(other, TDigest) or self.delta != other.delta:
            raise SketchError("cannot merge t-digests with different parameters")
        out = TDigest(self.delta)
        out.n = self.n + other.n
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        if len(m):
            order = np.argsort(m, kind="stable")
            out._compress(m[order], w[order])
        return out

    # ---------------- serialization ----------------

    def to_bytes(self) -> bytes:
        return b"".join(
            [
                self.pack_header(),
                _FIXED.pack(self.delta, len(self.means), self.n),
                np.ascontiguousarray(self.means, dtype="<f8").tobytes(),
                np.ascontiguousarray(self.weights, dtype="<f8").tobytes(),
            ]
        )

    @classmethod
    @frame_guarded
    def from_bytes(cls, b: bytes) -> "TDigest":
        kind, _, _, _ = cls.unpack_header(b)
        if kind != KIND_TDIGEST:
            raise SketchError("not a serialized t-digest")
        delta, cnt, n = _FIXED.unpack_from(b, 8)
        pos = 8 + _FIXED.size
        out = cls(delta)
        out.n = n
        out.means = np.frombuffer(b, dtype="<f8", count=cnt, offset=pos).copy()
        pos += cnt * 8
        out.weights = np.frombuffer(b, dtype="<f8", count=cnt, offset=pos).copy()
        return out
