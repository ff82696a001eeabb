#!/usr/bin/env python3
"""Regenerate the driver evidence-window order in queries/__init__.py.

Policy (VERDICT r6 #7): the grading driver hash-checks the FIRST 50
registry entries each round, so window membership must rotate. The
generated order is least-recently-checked-first:

- entries with NO green CORRECTNESS row under their current semantics
  sort to the front — both brand-new queries (no row at all) and names
  passed via ``--changed`` (their rows predate an oracle/semantics
  change this round);
- the rest sort by ascending last-checked round (from the repo's
  CORRECTNESS_r{N}.json records), ties broken by name.

With N registry entries and a window of W=50 this bounds staleness at
ceil(N/W) rounds; tests/test_rotation.py proves the bound by simulation
and pins the committed list to this policy, so a hand edit that breaks
the ordering fails CI.

Usage:
    python tools/update_rotation.py [--changed name ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT = os.path.join(REPO, "bw_new_data_integration_spark", "queries", "__init__.py")
BEGIN_ORDER = "    # --- BEGIN GENERATED WINDOW ORDER (tools/update_rotation.py) ---"
END_ORDER = "    # --- END GENERATED WINDOW ORDER ---"
BEGIN_CHANGED = "    # --- BEGIN GENERATED CHANGED SET ---"
END_CHANGED = "    # --- END GENERATED CHANGED SET ---"
BEGIN_STAMP = "    # --- BEGIN GENERATED ROUND STAMP ---"
END_STAMP = "    # --- END GENERATED ROUND STAMP ---"


def _row_is_green(rec) -> bool:
    """A driver row counts as 'checked' only when it PASSED: a red row
    means the query has no valid evidence under current semantics and
    must rotate to the FRONT of the window, not the back."""
    if not isinstance(rec, dict):
        return False
    if rec.get("err") is not None:
        return False
    # hash_match may be absent for rows-only (non-SQL-expressible) gates
    return all(rec.get(k) is not False for k in ("rows_match", "schema_match", "hash_match"))


def last_checked_rounds(
    repo: str = REPO, through_round: int | None = None
) -> dict[str, int]:
    """query name -> latest round with a GREEN driver CORRECTNESS row.

    ``through_round`` caps which records count: rounds newer than the cap
    are ignored. The committed window order is stamped with the round it
    was generated over (``_WINDOW_GENERATED_THROUGH_ROUND``), so the
    pinning test passes that stamp here — a CORRECTNESS record delivered
    AFTER the builder's last commit (the round's own record, by
    construction) cannot invalidate the committed order (ADVICE r7 #1).
    """
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", os.path.basename(p))
        if not m:
            continue
        n = int(m.group(1))
        if through_round is not None and n > through_round:
            continue
        try:
            with open(p) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in rows.items():
            if _row_is_green(rec):
                last[name] = max(n, last.get(name, 0))
    return last


def rotation_order(
    names: list[str], last: dict[str, int], changed: set[str]
) -> list[str]:
    return sorted(
        names, key=lambda n: (0 if n in changed else last.get(n, 0), n)
    )


def _splice(src: str, begin: str, end: str, body: str) -> str:
    pre, found, rest = src.partition(begin)
    if not found:
        raise SystemExit(f"marker not found: {begin!r}")
    _, found, post = rest.partition(end)
    if not found:
        raise SystemExit(f"marker not found: {end!r}")
    return pre + begin + "\n" + body + end + post


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--changed",
        nargs="*",
        default=[],
        help="entries whose oracle/semantics changed this round "
        "(re-prioritized as never-checked)",
    )
    args = ap.parse_args()
    sys.path.insert(0, REPO)
    from bw_new_data_integration_spark import queries as q

    names = list(q.registry())
    # stamp = newest record present NOW; the order is generated over
    # records through this round, and the pinning test caps at it
    gen_round = 0
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", os.path.basename(p))
        if m:
            gen_round = max(gen_round, int(m.group(1)))
    last = last_checked_rounds(through_round=gen_round)
    changed = set(args.changed)
    unknown = changed - set(names)
    if unknown:
        raise SystemExit(f"--changed names not in registry: {sorted(unknown)}")
    order = rotation_order(names, last, changed)

    def note(n: str) -> str:
        if n in changed:
            return "changed this round"
        if n in last:
            return f"last driver row: r{last[n]}"
        return "never driver-checked"

    body = "".join(f'    "{n}",  # {note(n)}\n' for n in order)
    changed_body = "".join(f'    "{n}",\n' for n in sorted(changed))
    src = open(INIT).read()
    src = _splice(src, BEGIN_ORDER, END_ORDER, body)
    src = _splice(src, BEGIN_CHANGED, END_CHANGED, changed_body)
    src = _splice(src, BEGIN_STAMP, END_STAMP, f"    {gen_round}\n")
    tmp = INIT + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(src)
    os.replace(tmp, INIT)
    print(
        f"wrote {len(order)} entries ({len(changed)} changed, "
        f"{sum(1 for n in order if n not in last)} never-checked); "
        f"window head: {order[:5]}"
    )


if __name__ == "__main__":
    main()
