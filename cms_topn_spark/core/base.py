"""One mergeable-state protocol shared by every sketch in the library.

Every sketch (CMS+top-n, HLL, Bloom, KLL, t-digest, min-mask) implements the
same surface so the Spark layer (partition build → salted shuffle → tree merge
→ checkpoint) is written once and works for all of them:

    empty(**params)      -> sketch            (class constructor)
    add_batch(values)    -> None              (vectorized, no per-row Python)
    merge(other)         -> sketch            (commutative + associative)
    to_bytes()           -> bytes             (canonical little-endian layout)
    from_bytes(b)        -> sketch            (exact inverse; round-trip == b)

The serialized frame starts with a common 8-byte header::

    magic  b"SKS1"  | kind u8 | version u8 | item_type u8 | flags u8

followed by a kind-specific payload. ``kind`` dispatches deserialization via
the registry below. Byte-for-byte merge determinism (north star: serialized
``merge(merge(a,b),c) == merge(a,merge(b,c))``) is part of the contract and is
covered by property tests.
"""

from __future__ import annotations

import struct
from abc import ABC, abstractmethod

MAGIC = b"SKS1"
HEADER = struct.Struct("<4sBBBB")

KIND_CMS_TOPN = 1
KIND_MMS = 2
KIND_HLL = 3
KIND_BLOOM = 4
KIND_KLL = 5
KIND_TDIGEST = 6

_REGISTRY: dict[int, type] = {}


class SketchError(ValueError):
    """Raised with reference-verbatim messages for golden parity."""


def register(kind: int):
    def deco(cls):
        cls.KIND = kind
        _REGISTRY[kind] = cls
        return cls

    return deco


def frame_guarded(fn):
    """Wrap a ``from_bytes`` implementation so ANY malformed frame —
    truncated payload, short header, impossible field values — surfaces as
    SketchError, never a raw numpy/struct exception. ``sketch_from_bytes``
    has always guaranteed this for the polymorphic path; the per-class
    ``CmsTopn.from_bytes(...)`` entry points are equally part of the public
    surface and get the same guarantee (round-6 verify probe)."""

    def wrapped(cls, b: bytes):
        try:
            return fn(cls, b)
        except SketchError:
            raise
        except (ValueError, struct.error, IndexError, OverflowError) as e:
            raise SketchError(f"corrupt serialized sketch: {e}") from e

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


class MergeableSketch(ABC):
    KIND: int = 0
    VERSION: int = 1

    @abstractmethod
    def add_batch(self, values, counts=None) -> None: ...

    @abstractmethod
    def merge(self, other: "MergeableSketch") -> "MergeableSketch": ...

    @abstractmethod
    def to_bytes(self) -> bytes: ...

    @classmethod
    @abstractmethod
    def from_bytes(cls, b: bytes) -> "MergeableSketch": ...

    def pack_header(self, item_type: int = 0, flags: int = 0) -> bytes:
        return HEADER.pack(MAGIC, self.KIND, self.VERSION, item_type, flags)

    @staticmethod
    def unpack_header(b: bytes) -> tuple[int, int, int, int]:
        magic, kind, version, item_type, flags = HEADER.unpack_from(b, 0)
        if magic != MAGIC:
            raise SketchError("not a serialized sketch (bad magic)")
        return kind, version, item_type, flags


def sketch_from_bytes(b: bytes) -> MergeableSketch:
    """Polymorphic deserializer: dispatch on the kind byte.

    Any malformed frame — truncated payload, short header, impossible field
    values — surfaces as SketchError, never a raw numpy/struct exception."""
    try:
        kind, _, _, _ = MergeableSketch.unpack_header(b)
        cls = _REGISTRY.get(kind)
        if cls is None:
            raise SketchError(f"unknown sketch kind {kind}")
        return cls.from_bytes(b)
    except SketchError:
        raise
    except (ValueError, struct.error, IndexError, OverflowError) as e:
        raise SketchError(f"corrupt serialized sketch: {e}") from e


def sketch_to_hex(sk: MergeableSketch) -> str:
    """Printable text form of a serialized sketch — the analogue of the
    reference's ``cms_out``/``mms_out``, which are byteaout passthroughs
    (cms_mms.c:117-126): PG bytea hex literal ``\\x`` + lowercase hex."""
    return "\\x" + sk.to_bytes().hex()


def sketch_from_hex(s: str) -> MergeableSketch:
    """Inverse of :func:`sketch_to_hex` (reference ``cms_in``/``mms_in``,
    byteain passthrough, cms_mms.c:105-113). Malformed literals raise
    SketchError."""
    if not s.startswith("\\x"):
        raise SketchError('malformed bytea hex literal (must start with "\\x")')
    try:
        b = bytes.fromhex(s[2:])
    except ValueError as e:
        raise SketchError(f"malformed bytea hex literal: {e}") from e
    return sketch_from_bytes(b)


def merge_serialized(a: bytes | None, b: bytes | None) -> bytes | None:
    """NULL-identity merge on serialized states (reference: expected/union.out:4-21)."""
    if a is None:
        return b
    if b is None:
        return a
    return sketch_from_bytes(a).merge(sketch_from_bytes(b)).to_bytes()
