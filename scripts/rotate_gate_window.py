#!/usr/bin/env python
"""Regenerate the driver-gate priority order from the CORRECTNESS record.

The driver's correctness gate checks a 50-slot window of the registry in
iteration order; ``queries/__init__.py:_GATE_PRIORITY`` orders the FULL
registry by staleness of driver signal (oldest green round first, that
round's file order within) so every entry's latest driver row stays a
bounded number of rounds old. Each round's verdict asks for the rotation
to be regenerated from the ``CORRECTNESS_r*.json`` files — this script is
that regeneration, mechanical instead of hand-computed:

  python scripts/rotate_gate_window.py            # report + proposed order
  python scripts/rotate_gate_window.py --check    # exit 1 if the current
                                                  # window misses any of the
                                                  # stalest 50 entries

Staleness = the latest round whose CORRECTNESS file records the entry
green (hash_match, or rows_match for driver rows-only entries);
never-checked entries lead. Output is the full ordered tuple body, ready
to paste into ``_GATE_PRIORITY``; the window report shows which rounds
the proposed first-50 window drains.
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def staleness() -> tuple[dict[str, int], dict[str, int]]:
    """(entry -> latest green round, entry -> position in that round's file)."""
    last: dict[str, int] = {}
    pos: dict[str, int] = {}
    for path in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue  # e.g. a corrupt historical record — skip, don't die
        for i, (name, r) in enumerate(rows.items()):
            # a driver signal is a hash-green row, a rows-only green row,
            # or — for the oracle-less sketches (x30/x50) — a completed
            # run recorded as err == 'no_oracle' with a row count
            signaled = (
                r.get("hash_match")
                or r.get("rows_match")
                or (r.get("err") == "no_oracle" and r.get("spark_rows") is not None)
            )
            if signaled:
                last[name] = rnd
                pos[name] = i
    return last, pos


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--window", type=int, default=50, help="driver gate window size")
    args = ap.parse_args()

    from consensource_sds_spark.queries import REGISTRY, all_queries

    all_queries()
    names = list(REGISTRY)
    last, pos = staleness()
    # never-checked entries lead (staleness -inf), then oldest round,
    # file order within the round; registry order breaks remaining ties
    order = sorted(
        names, key=lambda n: (last.get(n, -1), pos.get(n, 0), names.index(n))
    )
    window = order[: args.window]
    drained: dict[int, int] = {}
    for n in window:
        drained[last.get(n, -1)] = drained.get(last.get(n, -1), 0) + 1
    print(f"# {len(names)} registry entries; staleness frontier drained by the")
    print(f"# proposed {args.window}-slot window: " + ", ".join(
        f"r{r}: {c}" for r, c in sorted(drained.items())))

    from consensource_sds_spark.queries import _GATE_PRIORITY

    current_window = [n for n in _GATE_PRIORITY if n in REGISTRY][: args.window]
    missing = [n for n in window if n not in current_window]
    if args.check:
        if missing:
            print(f"# STALE WINDOW: {len(missing)} of the stalest {args.window} "
                  f"entries are outside the current window: {missing[:10]}...")
            return 1
        print("# current window covers the stalest entries — no rotation needed")
        return 0
    print("_GATE_PRIORITY: tuple[str, ...] = (")
    for n in order:
        print(f"    {n!r},")
    print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
