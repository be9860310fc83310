"""Composite sketch state: several named sketches built in ONE input scan.

At 100 TB the scan dominates every other cost, so the north-star workload
(heavy-hitter URLs, hostnames and tokens plus distinct counts over the same
pages — BASELINE.json:6) should be a single pass: each partition builds all
sketches at once and ships one composite state row. Merge is per-child (the
composite of mergeables is mergeable); serialization frames each child with
its name so the result is self-describing.
"""

from __future__ import annotations

import struct

from .base import MergeableSketch, frame_guarded, SketchError, register, sketch_from_bytes

KIND_COMPOSITE = 7
_ENTRY = struct.Struct("<HI")  # name_len, payload_len


@register(KIND_COMPOSITE)
class CompositeSketch(MergeableSketch):
    def __init__(self, children: dict[str, MergeableSketch]):
        self.children = dict(children)

    def __getitem__(self, name: str) -> MergeableSketch:
        return self.children[name]

    def add_batch(self, values, counts=None) -> None:  # pragma: no cover
        raise NotImplementedError("feed children directly (per-column ingest)")

    def merge(self, other: "CompositeSketch") -> "CompositeSketch":
        if not isinstance(other, CompositeSketch) or set(self.children) != set(other.children):
            raise SketchError("cannot merge composites with different children")
        return CompositeSketch(
            {k: self.children[k].merge(other.children[k]) for k in sorted(self.children)}
        )

    def to_bytes(self) -> bytes:
        parts = [self.pack_header()]
        parts.append(struct.pack("<I", len(self.children)))
        for name in sorted(self.children):
            payload = self.children[name].to_bytes()
            nb = name.encode("utf-8")
            parts.append(_ENTRY.pack(len(nb), len(payload)))
            parts.append(nb)
            parts.append(payload)
        return b"".join(parts)

    @classmethod
    @frame_guarded
    def from_bytes(cls, b: bytes) -> "CompositeSketch":
        kind, _, _, _ = cls.unpack_header(b)
        if kind != KIND_COMPOSITE:
            raise SketchError("not a serialized composite sketch")
        (n,) = struct.unpack_from("<I", b, 8)
        pos = 12
        children = {}
        for _ in range(n):
            nlen, plen = _ENTRY.unpack_from(b, pos)
            pos += _ENTRY.size
            name = b[pos : pos + nlen].decode("utf-8")
            pos += nlen
            children[name] = sketch_from_bytes(b[pos : pos + plen])
            pos += plen
        return cls(children)
