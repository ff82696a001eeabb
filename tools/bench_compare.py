"""Diff two bench records: per-query ratios over the common set, the
biggest movers, and the common-set sums — the mechanical form of the
"is this drift noise or regression?" question that round 4 left open.

Usage:
    python tools/bench_compare.py BENCH_old.json BENCH_new.json [--top 10]

Accepts either bench.py's sidecar format ({"queries": {...}}) or the
driver's BENCH_r{N}.json wrapper (per-query numbers recovered from the
embedded stdout JSON line when present).
"""
from __future__ import annotations

import argparse
import json
import re
import sys


def load_record(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc:
        return doc
    if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
        return doc["parsed"]
    tail = doc.get("tail", "")
    m = re.search(r'\{"metric":.*\}', tail)
    if m:
        return json.loads(m.group(0))
    raise SystemExit(f"{path}: no per-query record found")


def load_queries(path: str) -> dict[str, float]:
    return dict(load_record(path)["queries"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()
    old_rec, new_rec = load_record(args.old), load_record(args.new)
    old, new = dict(old_rec["queries"]), dict(new_rec["queries"])
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    s_old = sum(old[q] for q in common)
    s_new = sum(new[q] for q in common)
    print(
        f"common queries: {len(common)}  old={s_old:.1f}s  new={s_new:.1f}s  "
        f"ratio={s_new / s_old:.2f}"
    )
    # the FROZEN cross-round basis (bench.py COMMON_CORE, round 7 on):
    # when either record names it, compare over that list — the ad-hoc
    # intersection above shifts as coverage grows; the frozen set doesn't
    core = new_rec.get("common_core") or old_rec.get("common_core")
    if core:
        c = [q for q in core if q in old and q in new]
        co, cn = sum(old[q] for q in c), sum(new[q] for q in c)
        if c and co > 0:
            print(
                f"common_core ({len(c)}/{len(core)} frozen): old={co:.1f}s  "
                f"new={cn:.1f}s  ratio={cn / co:.2f}"
            )
        else:
            print(f"common_core: no shared entries between the records ({len(core)} frozen)")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old[:8])}{' …' if len(only_old) > 8 else ''}")
    if only_new:
        print(f"added ({len(only_new)}): {', '.join(only_new[:8])}{' …' if len(only_new) > 8 else ''}")
    movers = sorted(
        (q for q in common if old[q] >= 0.15 or new[q] >= 0.15),
        key=lambda q: new[q] / max(old[q], 0.01),
        reverse=True,
    )
    print(f"\nslowed most (of queries ≥0.15s):")
    for q in movers[: args.top]:
        print(f"  {q}: {old[q]:.2f}s -> {new[q]:.2f}s  ({new[q] / max(old[q], 0.01):.2f}x)")
    print(f"\nimproved most:")
    for q in list(reversed(movers))[: args.top]:
        print(f"  {q}: {old[q]:.2f}s -> {new[q]:.2f}s  ({new[q] / max(old[q], 0.01):.2f}x)")


if __name__ == "__main__":
    sys.exit(main())
