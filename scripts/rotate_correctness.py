#!/usr/bin/env python
"""Spot-verify ANY named subset of registry queries with the driver's
exact rows/schema/value-hash comparator (see scripts/correctness_lib.py).

Exists so an external auditor can pick an arbitrary slice — one the
builder didn't choose — and get per-query evidence cheaply:

    python scripts/rotate_correctness.py qx139 q74 q46     # named
    python scripts/rotate_correctness.py --random 10 --seed 7
    python scripts/rotate_correctness.py --all              # full sweep

Prints the per-query record dict as JSON to stdout (plus a one-line
summary); never writes repo artifacts — self_correctness.py owns the
CORRECTNESS_SELF_r{N}.json file.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.correctness_lib import DEFAULT_SF, run_checks, summarize


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="registry query names to check")
    ap.add_argument("--all", action="store_true", help="check every registry query")
    ap.add_argument("--random", type=int, metavar="N", help="check N random queries")
    ap.add_argument("--seed", type=int, default=None, help="seed for --random")
    ap.add_argument("--sf", default=DEFAULT_SF, help="fixture dir (default sf0.01)")
    args = ap.parse_args()

    if args.all:
        names = None
    elif args.random:
        from bqfetch_spark.registry import all_queries

        pool = sorted(all_queries())
        rng = random.Random(args.seed)
        names = rng.sample(pool, min(args.random, len(pool)))
    elif args.names:
        names = args.names
    else:
        ap.error("give query names, --random N, or --all")

    out = run_checks(names, sf=args.sf)
    print(json.dumps({"queries": out, "summary": summarize(out), "sf": args.sf},
                     indent=1, sort_keys=True))
    bad = [
        n
        for n, r in out.items()
        if r["err"] not in (None, "no_oracle")
        or (r["err"] is None and not (r["rows_match"] and r["schema_match"] and r["hash_match"]))
    ]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
