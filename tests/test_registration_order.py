"""Regression guard for registry order (VERDICT.md round 1 item 8; made
stale-proof in round 5 per VERDICT r4 item 1).

The driver's correctness pass walks ``queries()`` in registration order and
caps at exactly 50 rows per round. ``REGISTRY_PRIORITY`` pins a
query-granular order with the never-driver-verified queries first; these
tests make sure a refactor can't silently undo that.

Stale-proofing: the driver writes ``CORRECTNESS_r{N}.json`` AFTER the
builder's final commit every round, so any assertion of *exact* equality
between the committed priority lists and a disk glob of correctness files is
false by construction at judge time (this broke pytest-green in rounds 3 and
4). The checks below are therefore one-sided:

- ``PRIORITY_VERIFIED`` must be a SUBSET of the driver-green union — a
  post-commit driver file can only ever ADD green names, never fail us.
- "Never verified" is derived from the pinned ``KNOWN_ROUNDS`` snapshot
  (the correctness files that existed when the lists were last refreshed),
  not from whatever is on disk at evaluation time.
"""

from __future__ import annotations

import json
import pathlib

import rvi_big_data_api_spark as engine

_ROOT = pathlib.Path(__file__).resolve().parent.parent

# Rounds whose CORRECTNESS files were on disk when PRIORITY_VERIFIED was last
# refreshed. Bump this list (and refresh the priority lists) once per round;
# a newer CORRECTNESS_r*.json written after our last commit is deliberately
# ignored by the snapshot checks below.
KNOWN_ROUNDS = ["r01", "r02", "r03", "r04", "r05", "r06", "r07", "r08", "r09",
                "r10", "r11"]


def _counts_as_green(name: str, rec: dict) -> bool:
    """A driver row counts as green under the query's CURRENT contract:
    either it hash-passed, or it was a rows-only check (`no_oracle`) AND the
    query still has no oracle (rows-only by design). A pre-oracle `no_oracle`
    row for a query that has since gained a SQL twin does NOT count — the
    twin has never been driver-checked (VERDICT r5: `source_inmemory`)."""
    if rec.get("hash_match"):
        return True
    if rec.get("err") == "no_oracle":
        return name not in engine.oracles()
    return False


# Snapshot green set: exactly the pinned rounds.
SNAPSHOT_GREEN: set[str] = set()
for _r in KNOWN_ROUNDS:
    _recs = json.loads((_ROOT / f"CORRECTNESS_{_r}.json").read_text())
    SNAPSHOT_GREEN |= {n for n, rec in _recs.items() if _counts_as_green(n, rec)}

# Full green set: every correctness file on disk, including any the driver
# wrote after our last commit. Used only for one-sided (subset) checks.
DRIVER_GREEN: set[str] = set()
for _f in sorted(_ROOT.glob("CORRECTNESS_r*.json")):
    _recs = json.loads(_f.read_text())
    DRIVER_GREEN |= {n for n, rec in _recs.items() if _counts_as_green(n, rec)}


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


def test_verified_list_is_subset_of_driver_records():
    """Every name we claim as verified has a driver row. One-sided: a driver
    file newer than our snapshot may add green names without failing this."""
    unbacked = set(engine.PRIORITY_VERIFIED) - DRIVER_GREEN
    assert not unbacked, f"PRIORITY_VERIFIED names without a driver row: {unbacked}"


def test_verified_list_covers_snapshot():
    """Every snapshot-green name STILL IN THE REGISTRY is in
    PRIORITY_VERIFIED — the lists were actually refreshed for the pinned
    rounds. A green name absent from the registry is a rename (r9:
    dedup_embed_scaled → dedup_embed_pinned8); the new name re-queues in
    PRIORITY_UNVERIFIED for its own driver row."""
    missing = (SNAPSHOT_GREEN & set(engine.queries())) - set(engine.PRIORITY_VERIFIED)
    assert not missing, f"snapshot-green names missing from PRIORITY_VERIFIED: {missing}"


def test_unverified_queries_register_before_verified_ones():
    """Every snapshot-green query sits AFTER every never-verified one, so a
    capped driver pass spends its budget on new information."""
    names = list(engine.queries())
    unverified = [n for n in names if n not in SNAPSHOT_GREEN]
    if not unverified:
        return  # whole registry verified — nothing to order
    boundary = names.index(unverified[-1])
    greens_before_boundary = [n for n in names[: boundary + 1] if n in SNAPSHOT_GREEN]
    assert not greens_before_boundary, (
        "snapshot-green queries registered ahead of never-verified ones: "
        f"{greens_before_boundary}"
    )


def test_first_entries_are_all_never_verified():
    names = list(engine.queries())
    n_unverified = sum(1 for n in names if n not in SNAPSHOT_GREEN)
    head = names[: min(50, n_unverified)]
    already_green = [n for n in head if n in SNAPSHOT_GREEN]
    assert not already_green, already_green
