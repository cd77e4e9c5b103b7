#!/usr/bin/env python
"""Interactive SQL REPL — the engine's analog of the reference's entry
point (``/root/reference/src/main.rs:31-45``), which read a line, built a
logical plan, and printed it. Here the line is parsed/planned by Catalyst
and *executed*; ``EXPLAIN <query>`` shows the plan the reference stopped at.

Usage: python scripts/repl.py  (Ctrl-D to exit)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mura_spark import MuraSession, get_spark

    ms = MuraSession(get_spark("mura-repl"))
    ms.spark.sparkContext.setLogLevel("ERROR")
    print("mura-spark SQL REPL — CREATE EXTERNAL TABLE / SELECT / "
          "EXPLAIN; versioned tables (file_type='mura') also take "
          "DELETE / UPDATE / MERGE INTO (incl. WHEN NOT MATCHED BY "
          "SOURCE), ALTER TABLE ADD/DROP CONSTRAINT, OPTIMIZE "
          "[ZORDER BY], VACUUM [RETAIN n VERSIONS], t VERSION AS OF n "
          "/ FOR TAG 'x', table_changes('t', from). Ctrl-D exits.")
    while True:
        try:
            line = input("mura> ").strip()
        except EOFError:
            print()
            break
        if not line:
            continue
        try:
            df = ms.sql(line)
            # DDL returns an empty frame; queries print rows
            if df.columns:
                df.show(20, truncate=False)
            else:
                print("OK")
        except Exception as e:  # surface analyzer errors, keep the loop
            print(f"error: {e}")


if __name__ == "__main__":
    main()
