#!/usr/bin/env python
"""Self-reported CORRECTNESS artifact for EVERY registry query.

The external correctness file caps at 50 sorted query names, so ~half
the registry has no driver-side row (COVERAGE.md documents the gap).
This script runs the IDENTICAL check — Spark result vs DuckDB oracle at
sf0.01, rows + sorted-column schema + dtype-sensitive value hash (the
strict comparator from tests/conftest.py) — for all registry names and
writes CORRECTNESS_SELF_r{N}.json in the driver file's per-query
schema, so driver vs self coverage can be diffed directly.

For arbitrary named subsets (auditor spot-checks), use
scripts/rotate_correctness.py — same comparator, shared code.

Usage: python scripts/self_correctness.py [round_number]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.correctness_lib import DEFAULT_SF, run_checks, summarize


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    out = run_checks(None, sf=DEFAULT_SF)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, f"CORRECTNESS_SELF_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "artifact": os.path.basename(path),
                "sf": DEFAULT_SF,
                **summarize(out),
            }
        )
    )


if __name__ == "__main__":
    main()
