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
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from mura_spark.suite import ORACLE_SQL, SPARK_QUERIES
    green = set()
    for path in sorted(glob.glob(os.path.join(REPO,
                                              "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match") and not row.get("err"):
                    green.add(name)
    reg = list(SPARK_QUERIES)
    debt = [n for n in reg if n in ORACLE_SQL and n not in green]
    window = reg[:50]
    if all(n in debt for n in window):
        print(f"# window already all-never-verified; debt={len(debt)} "
              f"(no rotation needed)")
        return 1
    new_priority, new_next = debt[:50], debt[50:]
    print(f"# debt: {len(debt)} never-driver-verified oracled queries")
    print(f"# new _PRIORITY ({len(new_priority)}):")
    for n in new_priority:
        print(f'    "{n}",')
    print(f"# new _NEXT_WINDOW ({len(new_next)}):")
    for n in new_next:
        print(f'    "{n}",')
    print("# after pasting, run: pytest tests/test_registry.py -q")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
