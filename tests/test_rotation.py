"""Driver evidence-window rotation policy (VERDICT r6 #7).

The grading driver hash-checks the FIRST 50 registry entries per round;
tools/update_rotation.py generates that order least-recently-checked-
first. These tests (no Spark needed) pin the committed order to the
policy and prove the staleness bound by simulation: with N entries and
a window of W, every entry re-enters the window within ceil(N/W)
rounds."""

from __future__ import annotations

import math
import os
import sys

WINDOW = 50
# tools/ is a repo-root namespace package, not installed — resolve the
# root from this file so the tests run from any checkout location
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _registry_names():
    from bw_new_data_integration_spark import queries as q

    return list(q.registry())


def test_committed_order_is_least_recently_checked_first():
    """The committed _DRIVER_WINDOW_PRIORITY must equal the policy sort
    over the CORRECTNESS records that existed when it was generated — a
    hand edit that skips the generator (or a generator regression) fails
    here. Records newer than the generation stamp are excluded: the
    round's OWN record is delivered after the builder's last commit, so
    without the cap this test would open every round red (ADVICE r7 #1)."""
    from tools.update_rotation import last_checked_rounds, rotation_order

    from bw_new_data_integration_spark.queries import (
        _DRIVER_WINDOW_PRIORITY,
        _WINDOW_CHANGED_THIS_ROUND,
        _WINDOW_GENERATED_THROUGH_ROUND,
    )

    names = _registry_names()
    want = rotation_order(
        names,
        last_checked_rounds(through_round=_WINDOW_GENERATED_THROUGH_ROUND),
        _WINDOW_CHANGED_THIS_ROUND,
    )
    assert _DRIVER_WINDOW_PRIORITY == want
    # and the registry's iteration order (what the driver actually
    # samples) follows the priority list exactly
    assert names == [n for n in _DRIVER_WINDOW_PRIORITY if n in set(names)]


def test_rotation_bounds_staleness():
    """Simulate the policy forward: each simulated round checks the
    window and re-sorts. From the REAL current state, every entry must
    be checked at least once every ceil(N/WINDOW) rounds, forever."""
    from tools.update_rotation import last_checked_rounds, rotation_order

    names = _registry_names()
    last_all = last_checked_rounds()
    last = {n: last_all.get(n, 0) for n in names}
    bound = math.ceil(len(names) / WINDOW)
    start_round = max(last.values()) + 1
    checked_at: dict[str, list[int]] = {n: [] for n in names}
    for r in range(start_round, start_round + 4 * bound):
        order = rotation_order(names, last, set())
        for n in order[:WINDOW]:
            last[n] = r
            checked_at[n].append(r)
    horizon = start_round + 4 * bound
    for n in names:
        rounds = checked_at[n]
        assert rounds, f"{n} never entered the window"
        # first check happens within the bound...
        assert rounds[0] < start_round + bound, (
            f"{n} first checked at {rounds[0]}, bound {start_round + bound}"
        )
        # ...and every gap between consecutive checks stays within it
        for a, b in zip(rounds, rounds[1:]):
            assert b - a <= bound, f"{n} gap {b - a} > {bound}"
        assert horizon - rounds[-1] <= bound


def test_new_entries_jump_to_window_front():
    """A brand-new query (no CORRECTNESS row) and a semantics-changed
    one must land in the next round's window regardless of history."""
    from tools.update_rotation import rotation_order

    names = [f"q{i:03d}" for i in range(200)]
    last = {n: 2 + (i % 4) for i, n in enumerate(names)}
    names.append("brand_new_gate")  # no last-checked entry
    order = rotation_order(names, last, {"semantics_moved"})
    assert order.index("brand_new_gate") < WINDOW
    names.append("semantics_moved")
    last["semantics_moved"] = 6  # recently green — but under OLD semantics
    order = rotation_order(names, last, {"semantics_moved"})
    assert order.index("semantics_moved") < WINDOW
