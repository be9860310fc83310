"""Cross-read the reference's OWN serialized binary fixtures.

The reference regression suite ships two COPY dumps of sketch states
(data/in_out_test: text COPY of 7 bytea hex rows; data/send_recv_test: binary
COPY of one row), produced by ``cms_add_agg(int_column, 3)`` per distinct
value of the ``numbers`` table and ``cms_topn_add_agg(text_column, 3)`` over
the ``strings`` table (input/copy.source:6-17, sql/union_agg.sql:44-51).

Parsing their counter planes and checking them cell-for-cell against sketches
built by THIS library pins everything the SURVEY's hand analysis claimed:
MurmurHash3_x64_128 seed and bit parity, the PG datum encoding of int4/text
items, the double-hash column rule h1 + i*h2 mod width, and the default
(e=0.001, p=0.99) → (w=2719, d=5) sizing — against the reference's own
binary artifacts, not vectors we generated.

Reference struct layout (discovered from the fixtures, upstream CmsTopn):
28-byte header (7 u32: depth, width, n, sizeForTopnItem, ...) then the
d×w u64 counter plane, then the top-n item area. Each fixture row holds ONE
distinct item, so exactly d cells are nonzero and all equal its exact count —
conservative update is order-independent in that regime, making the
comparison deterministic.
"""

import os
import struct

import numpy as np
import pytest

from cms_topn_spark.core import CmsTopn

REF_DATA = "/root/reference/data"
_HDR_BYTES = 28  # 7 × u32 before the counter plane

# numbers/strings table contents, pinned by expected/results.out:90-180
INT_COUNTS = {0: 200, 1: 10, 2: 150, 3: 3, 4: 40000, 5: 6000}
TEXT_COUNTS = {"0": 2, "1": 1, "2": 15000, "3": 20, "4": 6, "5": 70000}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not present"
)


def _counters(payload: bytes) -> tuple[int, int, np.ndarray]:
    depth, width = np.frombuffer(payload[:8], "<u4")
    plane = np.frombuffer(
        payload[_HDR_BYTES : _HDR_BYTES + depth * width * 8], "<u8"
    ).reshape(depth, width)
    return int(depth), int(width), plane


def test_in_out_text_copy_int_sketches_cell_parity():
    lines = open(os.path.join(REF_DATA, "in_out_test")).read().splitlines()
    data_lines = [l for l in lines if l.startswith("\\\\x")]
    assert len(data_lines) >= 6
    for value, count in INT_COUNTS.items():
        payload = bytes.fromhex(data_lines[value][3:])
        depth, width, ref_plane = _counters(payload)
        ours = CmsTopn(3)  # defaults → w=2719, d=5, conservative update
        assert (ours.depth, ours.width) == (depth, width) == (5, 2719)
        # single repeated item: batched conservative update (est + count) is
        # exactly the sequential result; int items hash as PG int4 datums
        ours.add_batch([value], counts=[count])
        assert np.array_equal(ours.counters, ref_plane), f"int item {value}"
        assert ours.estimate(value) == count


def test_send_recv_binary_copy_text_sketch_cell_parity():
    raw = open(os.path.join(REF_DATA, "send_recv_test"), "rb").read()
    # PGCOPY binary: 11-byte signature, u32 flags, u32 ext len, then tuples of
    # (i16 nfields, i32 field_len, bytes), trailer i16 == -1; all big-endian
    assert raw[:11] == b"PGCOPY\n\xff\r\n\x00"
    pos = 11 + 4 + 4
    nfields = struct.unpack_from(">h", raw, pos)[0]
    assert nfields == 1
    field_len = struct.unpack_from(">i", raw, pos + 2)[0]
    payload = raw[pos + 6 : pos + 6 + field_len]
    depth, width, ref_plane = _counters(payload)

    ours = CmsTopn(3)
    assert (ours.depth, ours.width) == (depth, width)
    # one sketch over ALL strings-table rows; collision-free width ⇒ each
    # item's d cells hold its exact count whatever the insertion order was
    # (so per-item batched counts reproduce the reference's sequential build)
    ours.add_batch(list(TEXT_COUNTS), counts=list(TEXT_COUNTS.values()))
    assert np.array_equal(ours.counters, ref_plane)
    for item, count in TEXT_COUNTS.items():
        assert ours.estimate(item) == count
    # and the trailer confirms exactly one tuple
    end = pos + 6 + field_len
    assert struct.unpack_from(">h", raw, end)[0] == -1
