#!/usr/bin/env python
"""Compare two BENCH_DETAIL json files and print per-query regressions.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--ratio 1.5] [--min-sec 1.0] [--fail]

Each input is a bench.py detail file: ``{"queries": {name: sec, ...}, ...}``
(a bare ``{name: sec}`` mapping is accepted too).  Prints queries whose
timing moved by more than ``--ratio`` in either direction (ignoring
queries where both sides are under ``--min-sec`` — sub-second timings are
dominated by scheduling noise), plus queries added/removed between the
two files.  ``--fail`` exits 1 when any slowdown crosses the threshold,
so the check can gate CI.

This exists because per-query history was previously invisible in git
(BENCH_DETAIL.json was untracked): the round-11 ``dedup_edit`` 5.7s->12.1s
question would have been a one-command answer.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d) if isinstance(d, dict) else None
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no 'queries' mapping found")
    return {str(k): float(v) for k, v in q.items()}


def diff(old: dict[str, float], new: dict[str, float],
         ratio: float, min_sec: float) -> dict:
    common = sorted(set(old) & set(new))
    moved = []
    for name in common:
        a, b = old[name], new[name]
        if max(a, b) < min_sec:
            continue
        r = (b / a) if a > 0 else float("inf")
        if r >= ratio or (r > 0 and 1.0 / r >= ratio):
            moved.append({"query": name, "old_sec": a, "new_sec": b,
                          "ratio": round(r, 3)})
    moved.sort(key=lambda m: -m["ratio"])
    return {
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "moved": moved,
        "old_total_sec": round(sum(old.values()), 1),
        "new_total_sec": round(sum(new.values()), 1),
        "common": len(common),
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--ratio", type=float, default=1.5,
                   help="flag queries that moved by >= this factor (default 1.5)")
    p.add_argument("--min-sec", type=float, default=1.0,
                   help="ignore queries where both timings are under this (default 1.0)")
    p.add_argument("--fail", action="store_true",
                   help="exit 1 if any SLOWDOWN crosses the threshold")
    args = p.parse_args(argv)

    d = diff(_load(args.old), _load(args.new), args.ratio, args.min_sec)
    print(f"common={d['common']} old_total={d['old_total_sec']}s "
          f"new_total={d['new_total_sec']}s")
    if d["added"]:
        print(f"added ({len(d['added'])}): {', '.join(d['added'])}")
    if d["removed"]:
        print(f"removed ({len(d['removed'])}): {', '.join(d['removed'])}")
    if not d["moved"]:
        print(f"no query moved by >= {args.ratio}x (floor {args.min_sec}s)")
    else:
        print(f"{'query':40s} {'old_s':>8s} {'new_s':>8s} {'ratio':>7s}")
        for m in d["moved"]:
            print(f"{m['query']:40s} {m['old_sec']:8.2f} {m['new_sec']:8.2f} "
                  f"{m['ratio']:7.3f}")
    slowdowns = [m for m in d["moved"] if m["ratio"] >= args.ratio]
    return 1 if (args.fail and slowdowns) else 0


if __name__ == "__main__":
    sys.exit(main())
