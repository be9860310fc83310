"""Count-min sketch with an attached top-n heap (the reference's core type).

Semantics follow the reference extension and its golden regression outputs:

- sizing ``width = ceil(e/eps)``, ``depth = ceil(ln(1/(1-conf)))``, zeroed
  counters (cms_mms.c:292-298; pinned by expected/create.out:28-32),
- one MurmurHash3_x64_128 per item at seed 304837963, row hashes
  ``g_i = h1 + i*h2 (mod 2**64) mod width`` (cms_mms.c:349-372),
- conservative ("selective") update: only counters below the item's new
  estimate are raised (cms_mms.c:374-383), plus an order-free ``linear`` mode
  (plain ``+= count``) whose partial states merge exactly; both satisfy
  ``f(x) <= f̂(x) <= f(x) + eps*N`` (cms_mms.c:152-157),
- point estimate = min over the d probed cells, 0 for unseen items
  (cms_mms.c:425-445; expected/results.out:126-130),
- top-n array maintenance: an item enters/updates when its estimate qualifies,
  eviction replaces the lowest-frequency entry, output sorted frequency desc
  with insertion-order ties (expected/add.out:44-133, expected/add_agg.out),
- union: counters sum elementwise, candidates = union of both top-n sets
  re-estimated against the merged counters (expected/union.out:51-88); merges
  of sketches with different parameters or item types raise the reference's
  verbatim errors (expected/union.out:41-49),
- item-type stickiness: first item binds the type; mismatched adds/reads raise
  (expected/add.out:38-43, expected/results.out:17-19).

Batch adds are fully vectorized (numpy); per-unique-item work is bounded by a
``est >= current-min`` prefilter so the Python-side top-n loop only touches
plausible candidates. In ``conservative`` mode a batch is applied as a
"parallel conservative" update (estimates read from the pre-batch state, cells
raised with ``maximum.at``), which preserves the one-sided error guarantee and
equals the reference's sequential behavior whenever the batch is
collision-free (the regime of all golden tests).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from . import encoding as enc
from .base import KIND_CMS_TOPN, MergeableSketch, frame_guarded, SketchError, register
from .murmur import MURMUR_SEED, hash128

U64 = np.uint64

UPDATE_CONSERVATIVE = 0
UPDATE_LINEAR = 1

_FIXED = struct.Struct("<IIIIddQQ")  # depth, width, n, topn_count, eps, conf, total, next_seq
_ENTRY = struct.Struct("<QQI")  # freq, seq, item_len


def sizing(eps: float, confidence: float) -> tuple[int, int]:
    """width/depth formula, identical to the reference (cms_mms.c:292-293)."""
    width = int(math.ceil(math.e / eps))
    depth = int(math.ceil(math.log(1.0 / (1.0 - confidence))))
    return depth, width


@register(KIND_CMS_TOPN)
class CmsTopn(MergeableSketch):
    def __init__(
        self,
        n: int,
        eps: float = 0.001,
        confidence: float = 0.99,
        update: str = "conservative",
    ):
        # parameter validation order and messages per expected/create.out:6-20
        if n is None or int(n) <= 0:
            raise SketchError("Number of top items has to be positive")
        if not (0.0 < eps < 1.0):
            raise SketchError("Error bound has to be between 0 and 1")
        if not (0.0 < confidence < 1.0):
            raise SketchError("Confidence interval has to be between 0 and 1")
        self.n = int(n)
        self.eps = float(eps)
        self.confidence = float(confidence)
        self.update_mode = UPDATE_CONSERVATIVE if update == "conservative" else UPDATE_LINEAR
        self.depth, self.width = sizing(self.eps, self.confidence)
        self.counters = np.zeros((self.depth, self.width), dtype=U64)
        self.item_type = enc.TYPE_UNSET
        self.total = 0  # items added (N in the eps*N bound)
        self.next_seq = 0  # insertion sequence for tie-breaks
        self.topn: dict[bytes, list] = {}  # item_bytes -> [freq, seq]

    # ---------------- hashing ----------------

    def _cols(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(d, n) column indices: g_i = h1 + i*h2 mod 2^64 mod width."""
        d = self.depth
        i = np.arange(d, dtype=U64).reshape(d, 1)
        return ((h1[None, :] + i * h2[None, :]) % U64(self.width)).astype(np.int64)

    def _estimate_cols(self, cols: np.ndarray) -> np.ndarray:
        est = self.counters[0, cols[0]]
        for i in range(1, self.depth):
            est = np.minimum(est, self.counters[i, cols[i]])
        return est

    # ---------------- add ----------------

    def _bind_type(self, type_tag: int) -> None:
        if self.item_type == enc.TYPE_UNSET:
            self.item_type = type_tag
        elif self.item_type != type_tag:
            raise SketchError("not proper type for this cms_topn")

    def add(self, value) -> "CmsTopn":
        """Single-item add (reference-faithful sequential path). None → no-op
        (cms_topn_add(s, NULL) returns s unchanged, expected/add.out:20-36).
        Type inference is left to add_batch so a small int added to an
        int64-bound sketch gets the same sticky coercion as the batch path."""
        if value is None:
            return self
        self.add_batch([value])
        return self

    def add_batch(self, values, counts=None, type_tag: int | None = None) -> None:
        vals = [v for v in values if v is not None]
        if counts is not None:
            counts = np.asarray(
                [c for v, c in zip(values, counts) if v is not None], dtype=np.int64
            )
        if not vals:
            return
        if type_tag is None:
            type_tag = enc.resolve_batch_tag(vals, self.item_type)
        data, offsets, lengths = enc.encode_any(vals, type_tag)
        self.add_packed(data, offsets, lengths, counts=counts, type_tag=type_tag)

    def add_packed(
        self,
        data,
        offsets: np.ndarray,
        lengths: np.ndarray,
        counts: np.ndarray | None = None,
        type_tag: int = enc.TYPE_BINARY,
        hashes: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> None:
        """Vectorized bulk add over packed byte strings (the Spark hot path).
        ``hashes`` lets callers reuse one Murmur pass across several sketches."""
        n_items = len(lengths)
        if n_items == 0:
            return
        self._bind_type(type_tag)
        if counts is None:
            counts = np.ones(n_items, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            if counts.size and int(counts.min()) < 0:
                # a negative count would wrap through uint64 and silently
                # poison the counters (and everything merged with them)
                raise SketchError("item counts must be non-negative")

        if hashes is not None:
            h1, h2 = hashes
        else:
            h1, h2 = hash128(data, offsets, lengths, MURMUR_SEED)
        # group duplicate items within the batch by the FULL 128-bit hash —
        # a folded 64-bit key could collide two distinct items and merge their
        # counts, breaking the one-sided f̂ ≥ f guarantee. Stable lexsort +
        # run-boundary dedupe (void-dtype np.unique comparisons were ~4× the
        # cost); stability makes each group's first element the smallest
        # original index, i.e. np.unique's return_index semantics exactly.
        sort_ix = np.lexsort((h2, h1))
        h1s, h2s = h1[sort_ix], h2[sort_ix]
        new = np.ones(n_items, dtype=bool)
        new[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
        grp = np.cumsum(new) - 1
        # bincount's float64 weight accumulation is exact only while every
        # possible sum stays ≪ 2^53; max·n bounds the largest sum without
        # int64-overflow risk. Huge-count batches take the unbuffered exact
        # scatter instead — the one-sided f̂ ≥ f guarantee must hold for any
        # int64 counts (public add()/add_packed() accepts them)
        exact_scatter = int(counts.max()) * n_items > (1 << 52)
        if exact_scatter:
            u_counts = np.zeros(int(grp[-1]) + 1, dtype=np.int64)
            np.add.at(u_counts, grp, counts[sort_ix])
        else:
            u_counts = np.bincount(grp, weights=counts[sort_ix]).astype(np.int64)
        first_idx = sort_ix[new]
        uh1, uh2 = h1[first_idx], h2[first_idx]
        cols = self._cols(uh1, uh2)

        if self.update_mode == UPDATE_LINEAR:
            # bincount into width-sized bins beats np.add.at's unbuffered
            # scatter ~10× in the common small-count case; huge-count batches
            # (see exact_scatter above) keep the exact path
            if exact_scatter:
                uc64 = u_counts.astype(U64)
                for i in range(self.depth):
                    np.add.at(self.counters[i], cols[i], uc64)
            else:
                for i in range(self.depth):
                    self.counters[i] += np.bincount(
                        cols[i], weights=u_counts, minlength=self.width
                    ).astype(U64)
        else:
            # parallel conservative update: estimates from the pre-batch state
            est_pre = self._estimate_cols(cols)
            newval = est_pre + u_counts.astype(U64)
            # sorted segmented max + one vectorized maximum beats
            # np.maximum.at's unbuffered scatter ~5× (same result: each
            # touched cell gets max(cell, max of newvals hitting it))
            for i in range(self.depth):
                ci = cols[i]
                o = np.argsort(ci, kind="stable")
                cs = ci[o]
                starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
                seg_max = np.maximum.reduceat(newval[o], starts)
                uc = cs[starts]
                self.counters[i][uc] = np.maximum(self.counters[i][uc], seg_max)

        self.total += int(counts.sum())
        est_post = self._estimate_cols(cols)

        # ---- top-n maintenance (first-appearance order for tie parity) ----
        # prefilter: when the array is full, the entry rule is STRICT
        # (freq > evicted min, expected/add.out:60-76), so only est > cur_min
        # can change anything: a member at est == cur_min would be a no-op
        # update (stored ≥ min and counters are monotone force stored == est).
        # This strictness is what keeps long-tail keys (est == cur_min == 1,
        # e.g. mostly-unique URLs) out of the Python loop entirely.
        if len(self.topn) >= self.n:
            cur_min = min(e[0] for e in self.topn.values())
            cand = np.nonzero(est_post > U64(cur_min))[0]
        else:
            cand = np.arange(len(first_idx))
        if len(cand) == 0:
            self.next_seq += int(n_items)
            return
        order = cand[np.argsort(first_idx[cand], kind="stable")]
        offs = np.asarray(offsets, dtype=np.int64)
        lens = np.asarray(lengths, dtype=np.int64)
        mv = memoryview(data) if isinstance(data, (bytes, bytearray)) else memoryview(
            np.ascontiguousarray(data)
        )
        base_seq = self.next_seq
        # lazy-invalidated min-heap keyed by the eviction rule (lowest freq,
        # then newest seq) — O(log n) per candidate instead of an O(n) scan
        import heapq

        heap = [(int(e[0]), -int(e[1]), it) for it, e in self.topn.items()]
        heapq.heapify(heap)

        def pop_valid_min() -> tuple[int, bytes] | None:
            while heap:
                f, ns, it = heap[0]
                e = self.topn.get(it)
                if e is not None and e[0] == f and -e[1] == ns:
                    return f, it
                heapq.heappop(heap)  # stale
            return None

        est_list = est_post.tolist()
        first_list = first_idx.tolist()
        full = self.n
        for k in order.tolist():
            j = first_list[k]
            item = bytes(mv[offs[j] : offs[j] + lens[j]])
            freq = est_list[k]
            ent = self.topn.get(item)
            if ent is not None:
                if ent[0] != freq:
                    ent[0] = freq
                    heapq.heappush(heap, (freq, -ent[1], item))
            elif len(self.topn) < full:
                self.topn[item] = [freq, base_seq + j]
                heapq.heappush(heap, (freq, -(base_seq + j), item))
            else:
                vm = pop_valid_min()
                if vm is not None and freq > vm[0]:
                    del self.topn[vm[1]]
                    heapq.heappop(heap)
                    self.topn[item] = [freq, base_seq + j]
                    heapq.heappush(heap, (freq, -(base_seq + j), item))
        self.next_seq = base_seq + int(n_items)

    # ---------------- query ----------------

    def estimate_packed(self, data, offsets, lengths) -> np.ndarray:
        """Point estimates for a packed batch of items → int64 array."""
        h1, h2 = hash128(data, offsets, lengths, MURMUR_SEED)
        cols = self._cols(h1, h2)
        return self._estimate_cols(cols).astype(np.int64)

    def estimate(self, value) -> int | None:
        """cms_topn_frequency: NULL item → None (expected/results.out:61-84)."""
        return self.estimate_many([value])[0]

    def estimate_many(self, values) -> list:
        """Vectorized ``cms_topn_frequency`` over a probe list: coercion rules
        identical to :meth:`estimate` per item, but ONE Murmur pass + one
        counter gather for the whole list — the grouped-probe hot loop runs
        this once per state instead of a per-item Python round-trip."""
        enc_bytes: list = []
        out: list = [0] * len(values)
        for i, v in enumerate(values):
            if v is None:
                out[i] = None
                enc_bytes.append(None)
                continue
            tag = enc.infer_type_tag(v)
            if self.item_type != enc.TYPE_UNSET and tag != self.item_type:
                # integers coerce to the sketch's bound integer width; anything
                # else is the reference's type error (expected/results.out:17-19)
                if tag == enc.TYPE_INT32 and self.item_type == enc.TYPE_INT64:
                    tag = enc.TYPE_INT64
                elif tag == enc.TYPE_INT64 and self.item_type == enc.TYPE_INT32:
                    enc_bytes.append(None)  # cannot fit the bound type ⇒ 0
                    continue
                else:
                    raise SketchError("not a proper cms_topn for the result type")
            enc_bytes.append(enc.encode_one(v, tag))
        live = [i for i, b in enumerate(enc_bytes) if b is not None]
        if live:
            data = b"".join(enc_bytes[i] for i in live)
            lens = np.array([len(enc_bytes[i]) for i in live], dtype=np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            est = self.estimate_packed(data, offs, lens)
            for j, i in enumerate(live):
                out[i] = int(est[j])
        return out

    def _ordered_entries(self) -> list[tuple[bytes, int, int]]:
        items = [(it, int(e[0]), int(e[1])) for it, e in self.topn.items()]
        items.sort(key=lambda t: (-t[1], t[2], t[0]))
        return items

    def topn_list(self, type_tag: int | None = None) -> list[tuple[object, int]]:
        """The ``topn()`` SRF: [(item, frequency)] sorted frequency desc."""
        if type_tag is not None and self.item_type != enc.TYPE_UNSET and type_tag != self.item_type:
            raise SketchError("not a proper cms_topn for the result type")
        tag = self.item_type
        return [(enc.decode_one(it, tag), freq) for it, freq, _ in self._ordered_entries()]

    def info(self) -> str:
        """Verbatim info string (cms_mms.c:244-255; expected/create.out:28-32)."""
        size_kb = len(self.to_bytes()) // 1024
        return f"Sketch depth = {self.depth}, Sketch width = {self.width}, Size = {size_kb}kB"

    # ---------------- merge ----------------

    def merge(self, other: "CmsTopn") -> "CmsTopn":
        """Union per expected/union.out: counters sum elementwise, candidates
        = union of both top-n sets re-ranked against the merged counters,
        seq ranges concatenate (a's items order before b's on frequency ties).

        Associativity: counters, totals and all estimates are associative for
        any merge tree. Serialized bytes are additionally identical across
        merge orders whenever the candidate set is stable (no intermediate
        truncation drops an item that re-enters later) — the normal
        heavy-hitter regime; a dropped-and-re-entered item keeps its frequency
        but gets a merge-path-dependent insertion-order tie-break, exactly as
        the reference's insertion-ordered array would (property-tested in
        tests/test_properties.py)."""
        if not isinstance(other, CmsTopn):
            raise SketchError("cannot merge cms_topns of different types")
        if (
            self.n != other.n
            or self.eps != other.eps
            or self.confidence != other.confidence
            or self.depth != other.depth
            or self.width != other.width
            # mixed update modes would make the merged bytes (flags) and all
            # future updates depend on merge order — refuse loudly
            or self.update_mode != other.update_mode
        ):
            raise SketchError("cannot merge cms_topns with different parameters")
        if (
            self.item_type != enc.TYPE_UNSET
            and other.item_type != enc.TYPE_UNSET
            and self.item_type != other.item_type
        ):
            raise SketchError("cannot merge cms_topns of different types")
        out = CmsTopn.__new__(CmsTopn)
        out.n, out.eps, out.confidence = self.n, self.eps, self.confidence
        out.update_mode = self.update_mode
        out.depth, out.width = self.depth, self.width
        out.counters = self.counters + other.counters
        out.item_type = self.item_type if self.item_type != enc.TYPE_UNSET else other.item_type
        out.total = self.total + other.total
        # seq ranges concatenate on merge (a's items before b's), which both
        # reproduces the golden union tie order (expected/union.out:63-68:
        # 'two' from a sorts before 'three' from b at equal frequency) and
        # keeps merge associative: ((a⊕b)⊕c and a⊕(b⊕c) assign identical seqs.
        out.next_seq = self.next_seq + other.next_seq
        cand: dict[bytes, int] = {}
        for src, shift in ((self, 0), (other, self.next_seq)):
            for it, e in src.topn.items():
                seq = int(e[1]) + shift
                if it not in cand or seq < cand[it]:
                    cand[it] = seq
        out.topn = {}
        if cand:
            items = list(cand.keys())
            data, offsets, lengths = enc.encode_bytes_list(items)
            h1, h2 = hash128(data, offsets, lengths, MURMUR_SEED)
            cols = out._cols(h1, h2)
            est = out._estimate_cols(cols).astype(np.int64)
            ranked = sorted(
                ((items[i], int(est[i]), cand[items[i]]) for i in range(len(items))),
                key=lambda t: (-t[1], t[2], t[0]),
            )
            for it, freq, seq in ranked[: out.n]:
                out.topn[it] = [freq, seq]
        return out

    # ---------------- serialization ----------------

    def to_bytes(self) -> bytes:
        parts = [
            self.pack_header(item_type=self.item_type, flags=self.update_mode),
            _FIXED.pack(
                self.depth,
                self.width,
                self.n,
                len(self.topn),
                self.eps,
                self.confidence,
                self.total,
                self.next_seq,
            ),
            np.ascontiguousarray(self.counters, dtype="<u8").tobytes(),
        ]
        for it, freq, seq in self._ordered_entries():
            parts.append(_ENTRY.pack(freq, seq, len(it)))
            parts.append(it)
        return b"".join(parts)

    @classmethod
    @frame_guarded
    def from_bytes(cls, b: bytes) -> "CmsTopn":
        kind, version, item_type, flags = cls.unpack_header(b)
        if kind != KIND_CMS_TOPN:
            raise SketchError("not a serialized cms_topn")
        pos = 8
        depth, width, n, count, eps, conf, total, next_seq = _FIXED.unpack_from(b, pos)
        pos += _FIXED.size
        out = cls.__new__(cls)
        out.n, out.eps, out.confidence = n, eps, conf
        out.update_mode = flags
        out.depth, out.width = depth, width
        out.counters = (
            np.frombuffer(b, dtype="<u8", count=depth * width, offset=pos)
            .reshape(depth, width)
            .copy()
        )
        pos += depth * width * 8
        out.item_type = item_type
        out.total = total
        out.next_seq = next_seq
        out.topn = {}
        for _ in range(count):
            freq, seq, ln = _ENTRY.unpack_from(b, pos)
            pos += _ENTRY.size
            if pos + ln > len(b):
                raise SketchError("corrupt serialized sketch: truncated topn item")
            out.topn[bytes(b[pos : pos + ln])] = [freq, seq]
            pos += ln
        if pos != len(b):
            raise SketchError("corrupt serialized sketch: trailing bytes")
        return out

    # convenience for tests
    def __eq__(self, other) -> bool:
        return isinstance(other, CmsTopn) and self.to_bytes() == other.to_bytes()

    # deliberately unhashable: the sketch is MUTABLE and value-equal, so an
    # identity hash would break the hash/eq contract the moment two equal
    # sketches met in a set; key containers by to_bytes() instead
    __hash__ = None
