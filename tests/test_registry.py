"""Rotation-list integrity: DRIVER_PRIORITY is hand-maintained, and a typo
would silently skip a query's driver re-record (``_rotated`` keeps only
names present in the registry). ``get_queries()`` fails loudly instead —
these tests pin that guard and the round-5 rotation policy (VERDICT.md r4
items 1-2)."""

import json
import os

import pytest

from realtime_datawarehouse_spark.plans import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_rotation_name_is_registered():
    qs = registry.get_queries()  # raises on any unknown rotation name
    missing = [n for n in registry.DRIVER_PRIORITY if n not in qs]
    assert missing == []


def test_rotation_has_no_duplicates():
    dup = [
        n
        for n in set(registry.DRIVER_PRIORITY)
        if registry.DRIVER_PRIORITY.count(n) > 1
    ]
    assert dup == []


def test_misspelled_rotation_name_fails_loudly(monkeypatch):
    monkeypatch.setattr(
        registry,
        "DRIVER_PRIORITY",
        [*registry.DRIVER_PRIORITY, "dedup_minhash_lshh"],  # typo'd
    )
    with pytest.raises(ValueError, match="dedup_minhash_lshh"):
        registry.get_queries()


def test_rotation_head_leads_with_never_recorded_queries():
    """Round-5 policy: the first 50 emitted queries must be ones with no
    driver CORRECTNESS row in rounds 1-4 (a historical fact, so this pin
    never goes stale), closing the ledger gap at the driver's ~50-row
    budget rate."""
    recorded = set()
    for rnd in (1, 2, 3, 4):
        path = os.path.join(REPO, f"CORRECTNESS_r0{rnd}.json")
        with open(path, encoding="utf-8") as f:
            recorded.update(json.load(f))
    head = list(registry.get_queries())[:50]
    already = [n for n in head if n in recorded]
    assert already == []
