"""Registry invariants that need neither Spark nor driver testdata.

Kept separate from test_entry_contract.py on purpose: that module skips
entirely when /root/testdata is absent, and these guards must always run
(ADVICE round 4: the 50-entry cap silently disappeared without testdata).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def test_registry_is_at_most_50_entries():
    """The driver's correctness report holds at most 50 rows (observed in
    round 3: the 51st registered query silently fell off the report), so
    the registry must stay at <= 50 so every entry gets a driver row."""
    assert len(entry.queries()) <= 50


def test_every_oracle_key_has_a_query():
    qs = entry.queries()
    sql = entry.oracle_sql()
    assert set(sql) <= set(qs)
