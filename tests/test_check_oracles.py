"""Unit tests for the oracle checker's row-multiset comparison.

The checker is the local stand-in for the driver's correctness gate; a bug
in its sort key is a bug in the round's evidence. Round-6 ADVICE found one:
the str(c) tiebreaker gave equal numerics like 1 and 1.0 unequal keys, so a
column mixing int and float could sort two EQUAL multisets into
pairwise-unequal lists and report a false FAIL.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_oracles import _cell_key, rowset  # noqa: E402


def test_equal_multisets_with_mixed_numeric_types_compare_equal():
    # same multiset, one side int-typed, the other float-typed, in an order
    # that the old str(c) tiebreaker sorted differently
    a = rowset(["k", "v"], [("x", 1), ("x", 10), ("x", 2)])
    b = rowset(["k", "v"], [("x", 10.0), ("x", 2.0), ("x", 1.0)])
    assert a == b


def test_distinct_large_ints_keep_distinct_order():
    # 2**53 + 1 and 2**53 + 2 collide as floats; the key must still order
    # them exactly (int keys compare exactly in Python)
    big = 2**53
    a = rowset(["v"], [(big + 2,), (big + 1,)])
    b = rowset(["v"], [(big + 1,), (big + 2,)])
    assert a == b
    assert a[0] != a[1]


def test_null_and_nan_rows_sort_stably():
    from check_oracles import norm_cell

    rows = [(None,), (float("nan"),), (1.5,), ("z",)]
    normed = rowset(["v"], rows)
    # NULL first; NaN normalizes to the string "NaN" and sorts with strings
    assert normed[0] == (None,)
    assert ("NaN",) in normed
    assert norm_cell(float("nan")) == "NaN"


def test_cell_key_total_order_on_column_classes():
    # keys across the classes a real column produces must be comparable
    keys = sorted([_cell_key(None), _cell_key("a"), _cell_key(3), _cell_key(2.5)])
    assert keys[0] == _cell_key(None)
