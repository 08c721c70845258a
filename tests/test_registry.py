"""Registry-contract guards: the driver records CORRECTNESS rows for the
FIRST 50 keys of queries() only — these tests pin the rotation invariant
so no operator can silently fall out of hard-signal coverage."""

from __future__ import annotations

import json
from pathlib import Path

from engine.registry import _PRIORITY, all_oracles, all_queries

REPO = Path(__file__).resolve().parent.parent


def test_priority_keys_all_registered():
    assert set(_PRIORITY) <= set(all_queries())


def test_priority_has_no_duplicates():
    """A duplicate in _PRIORITY would silently shrink the graded 50-key
    window (dict-comprehension dedup in _ordered)."""
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_every_unverified_key_inside_driver_window():
    """Any key lacking a hash/rows row in EVERY prior round's
    CORRECTNESS file must sit inside the next round's graded 50-key
    window, or it will never get a hard driver signal."""
    prior: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        prior |= set(json.loads(f.read_text()))
    window = list(all_queries())[:50]
    missing = [k for k in all_queries() if k not in prior and k not in window]
    assert not missing, f"keys with no driver row and outside the window: {missing}"


def test_oracle_keys_subset_and_aliased():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs)
    # every oracle is non-trivial SQL
    for k, sql in os_.items():
        assert "SELECT" in sql.upper(), k
