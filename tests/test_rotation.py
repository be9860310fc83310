"""Registry-rotation coverage invariant (round-7 verdict item #7).

The driver's correctness harness records only the first ~50 ``queries()``
entries per round, so the registry rotates: entries missing from the most
recent record must sit inside the recording window THIS round, ensuring no
query goes two consecutive rounds unrecorded. This test makes that invariant
a gate instead of a comment, reading the most recent CORRECTNESS_r*.json
exactly as the judge does.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RECORD_WINDOW = 50  # the driver records the first ~50 queries() entries


def _registry_order() -> list[str]:
    """Parse the registry order from source — importing __spark_entry__ is
    fine too, but parsing keeps this test runnable without a JVM."""
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    m = re.search(r"def _raw_queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    return re.findall(r'"([a-z0-9_]+)": q_[a-z0-9_]+,', m.group(1))


def _latest_records(n: int = 2) -> list[set[str]]:
    recs = sorted(
        f for f in os.listdir(REPO) if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    out = []
    for f in recs[-n:]:
        try:
            data = json.load(open(os.path.join(REPO, f)))
        except Exception:
            continue  # an unparseable record can't prove coverage
        if isinstance(data, dict):
            out.append(set(data))
    return out


def test_no_query_misses_two_rounds():
    """Every registered query is either already in the most recent driver
    record or positioned inside the recording window for this round."""
    order = _registry_order()
    records = _latest_records(2)
    assert records, "no parseable CORRECTNESS record found"
    latest = records[-1]
    violations = [
        (name, i)
        for i, name in enumerate(order)
        if name not in latest and i >= RECORD_WINDOW
    ]
    assert not violations, (
        f"queries missing from the latest record AND outside the first "
        f"{RECORD_WINDOW} positions (would go 2+ rounds unrecorded): {violations}"
    )


def test_union_of_recent_records_plus_window_covers_registry():
    """The last two records plus this round's window cover EVERYTHING —
    i.e. nothing has already gone two rounds unrecorded."""
    order = _registry_order()
    seen = set().union(*_latest_records(2))
    uncovered = [
        name
        for i, name in enumerate(order)
        if name not in seen and i >= RECORD_WINDOW
    ]
    assert not uncovered, f"queries with no recent record and no window slot: {uncovered}"


def test_registry_is_consistent():
    """Every oracle and ordering spec refers to a registered query (a typo
    in one of the three dicts silently drops a gate)."""
    import __spark_entry__ as entry

    qs = set(entry.queries())
    assert set(entry.oracle_sql()) <= qs
    assert set(entry._ORDER) <= qs
    assert len(qs) == len(_registry_order())
