"""Regression guard for registry order (VERDICT.md round 1, item 8).

The driver's correctness pass walks ``queries()`` in registration order and
caps at exactly 50 rows per round (CORRECTNESS_r01/r02/r03.json each hold
exactly the first 50 registration-order entries of their round — 150 unique
queries across three rounds, zero overlap). ``REGISTRY_PRIORITY`` pins a
query-granular order with the never-driver-verified queries first; these
tests make sure a refactor can't silently undo that. The green set below is
refreshed each round from the recorded CORRECTNESS files.
"""

from __future__ import annotations

import json
import pathlib

import rvi_big_data_api_spark as engine

_ROOT = pathlib.Path(__file__).resolve().parent.parent

# Driver-green rows recorded so far (rounds 1-3, 50 each, zero failures).
DRIVER_GREEN: set[str] = set()
for _f in sorted(_ROOT.glob("CORRECTNESS_r*.json")):
    DRIVER_GREEN |= set(json.loads(_f.read_text()))


def test_priority_list_is_exhaustive():
    names = set(engine.queries())
    listed = set(engine.REGISTRY_PRIORITY)
    # Stragglers (new queries not yet prioritised) are allowed by the
    # reordering code, but should be added to the list promptly.
    assert listed <= names, f"priority list names missing queries: {listed - names}"


def test_registry_order_matches_priority():
    names = list(engine.queries())
    stragglers = [n for n in names if n not in set(engine.REGISTRY_PRIORITY)]
    expected = engine.PRIORITY_UNVERIFIED + stragglers + engine.PRIORITY_VERIFIED
    assert names == expected


def test_verified_list_matches_driver_records():
    """PRIORITY_VERIFIED holds exactly the queries with a driver row."""
    assert set(engine.PRIORITY_VERIFIED) == DRIVER_GREEN


def test_unverified_queries_register_before_verified_ones():
    """Every driver-green query sits AFTER every never-verified one, so a
    capped driver pass spends its budget on new information."""
    names = list(engine.queries())
    unverified = [n for n in names if n not in DRIVER_GREEN]
    boundary = names.index(unverified[-1])
    greens_before_boundary = [n for n in names[: boundary + 1] if n in DRIVER_GREEN]
    assert not greens_before_boundary, (
        "driver-green queries registered ahead of never-verified ones: "
        f"{greens_before_boundary}"
    )


def test_first_50_are_all_never_verified():
    names = list(engine.queries())[:50]
    already_green = [n for n in names if n in DRIVER_GREEN]
    assert not already_green, already_green
