"""Bit-parity of the vectorized Murmur3 kernel with the reference C hash.

Fixture vectors in tests/fixtures/murmur_vectors.tsv were produced by running
the reference's own MurmurHash3.c (seed 304837963, cms_mms.c:36) over strings,
int4 (4-byte LE) and int8 (8-byte LE) payloads — the exact encodings of
cms_mms.c:394-418. One bit of drift here breaks every golden test downstream.
"""

import os
import random

import numpy as np
import pytest

from cms_topn_spark.core.murmur import hash128, hash128_one

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "murmur_vectors.tsv")


def load_vectors():
    out = []
    with open(FIXTURE, encoding="utf-8") as f:
        for line in f:
            kind, val, h1, h2 = line.rstrip("\n").split("\t")
            if kind == "str":
                b = val.encode("utf-8")
            elif kind == "int4":
                b = int(val).to_bytes(4, "little", signed=True)
            else:
                b = int(val).to_bytes(8, "little", signed=True)
            out.append((kind, val, b, int(h1), int(h2)))
    return out


@pytest.mark.parametrize("kind,val,payload,h1,h2", load_vectors())
def test_reference_vectors(kind, val, payload, h1, h2):
    assert hash128_one(payload) == (h1, h2)


def test_batch_matches_scalar():
    random.seed(1)
    items = [os.urandom(random.randint(0, 70)) for _ in range(500)]
    data = b"".join(items)
    lens = np.array([len(x) for x in items])
    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    h1, h2 = hash128(data, offs, lens)
    for i, it in enumerate(items):
        assert (int(h1[i]), int(h2[i])) == hash128_one(it)


def test_noncontiguous_offsets():
    # Arrow buffers can be sliced: offsets need not start at 0 or be dense
    blob = b"XXXhelloYYYcms_topnZZZ"
    offs = np.array([3, 11])
    lens = np.array([5, 8])
    h1, h2 = hash128(blob, offs, lens)
    assert (int(h1[0]), int(h2[0])) == hash128_one(b"hello")
    assert (int(h1[1]), int(h2[1])) == hash128_one(b"cms_topn")


def test_empty_batch():
    h1, h2 = hash128(b"", np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(h1) == 0 and len(h2) == 0
