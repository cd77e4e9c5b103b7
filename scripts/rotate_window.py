#!/usr/bin/env python
"""Driver-window rotation helper for the next round.

The driver verifies only the FIRST 50 registry entries per round;
``mura_spark/suite/__init__.py`` encodes the window as ``_PRIORITY``
(50 names) and the contiguous overflow as ``_NEXT_WINDOW``, and
``tests/test_registry.py`` enforces the invariants against the
committed ``CORRECTNESS_r*.json`` ledgers. After a new ledger lands,
the rotation is mechanical: the new window is the first 50
never-driver-verified names in current registry order, the new
overflow is the rest of them. This script COMPUTES that split and
prints the two Python list bodies to paste into ``_PRIORITY`` /
``_NEXT_WINDOW`` (it does not edit the file — the lists carry
hand-written cohort comments worth keeping).

Run AFTER committing the round's CORRECTNESS ledger::

    python scripts/rotate_window.py

Exit status 1 if no rotation is needed (current window already holds
only never-verified queries).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from mura_spark.suite import ORACLE_SQL, SPARK_QUERIES

    def round_no(path: str) -> int:
        # numeric, not lexicographic: 'r100' must outrank 'r99'
        return int(re.search(r"r(\d+)", os.path.basename(path)).group(1))

    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
                       key=round_no):
        rnd = round_no(path)
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match") and not row.get("err"):
                    last_green[name] = rnd  # numeric sort → newest wins
    reg = list(SPARK_QUERIES)
    debt = [n for n in reg if n in ORACLE_SQL and n not in last_green]
    window = reg[:50]
    if len(debt) >= 50 and all(n in debt for n in window):
        print(f"# window already all-never-verified; debt={len(debt)} "
              f"(no rotation needed)")
        return 1
    new_priority = debt[:50]
    backfill = []
    if len(new_priority) < 50:
        # debt fits in one window: fill the remaining slots with
        # re-verification backfill, STALEST first (oldest last-green
        # round, then registry order) — the ordering
        # tests/test_registry.py::test_window_prefers_stalest_rows pins
        verified = [n for n in reg
                    if n in ORACLE_SQL and n in last_green]
        by_staleness = sorted(
            range(len(verified)),
            key=lambda i: (last_green[verified[i]], i))
        backfill = [verified[i] for i in
                    by_staleness[:50 - len(new_priority)]]
        new_priority = new_priority + backfill
    new_next = debt[50:]
    print(f"# debt: {len(debt)} never-driver-verified oracled queries"
          + (f" + {len(backfill)} stalest-green backfill slots"
             if backfill else ""))
    print(f"# new _PRIORITY ({len(new_priority)}):")
    for n in new_priority:
        tag = (f"  # backfill (r{last_green[n]:02d})"
               if n in set(backfill) else "")
        print(f'    "{n}",{tag}')
    print(f"# new _NEXT_WINDOW ({len(new_next)}):")
    for n in new_next:
        print(f'    "{n}",')
    print("# after pasting, run: pytest tests/test_registry.py -q")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
